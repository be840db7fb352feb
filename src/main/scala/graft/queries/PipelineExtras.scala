package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-7 pipeline operators: per-key quotas, time-series gap fill,
  * and incrementally-maintained aggregates. Same conventions as
  * [[CorpusExtras]] (shared literals between Spark and oracle SQL). */
object PipelineExtras {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** q61: per-source document quota ([[graft.operators.SourceQuota]]) —
    * RefinedWeb-style "at most 15 docs per domain", selected by the
    * deterministic Knuth-hash priority. The operator's map-side bounded
    * heap must reproduce the oracle's window formulation exactly. */
  def q61SourceQuota(s: SparkSession, dir: String): DataFrame =
    graft.operators.SourceQuota.cap(
        Tables.parallel(s, dir, "documents"), "source", "doc_id", n = 15)
      .select(col("key").as("source"), col("rank"),
        col("id").as("doc_id"), col("pri"))
      .orderBy("source", "rank")

  /** q62: dense hourly grid per event type ([[graft.operators.GapFill]])
    * — ClickHouse `ORDER BY … WITH FILL` semantics: every hour between
    * each type's first and last event, gaps zero-filled and flagged. */
  def q62WithFill(s: SparkSession, dir: String): DataFrame =
    graft.operators.GapFill.fillTimeBuckets(
        Tables(s, dir, "events"), "event_type", "ts", "1 hour",
        Seq("cnt" -> count(lit(1)),
          "sum_val" -> round(dsum(col("value")), 4)))
      .select(col("series").as("event_type"), col("bucket"),
        col("cnt"), col("sum_val"), col("filled"))
      .orderBy("event_type", "bucket")

  /** q63: incrementally-maintained aggregate table
    * ([[graft.operators.IncrementalAgg]], the AggregatingMergeTree
    * analog). History (doc_id%10 < 8) is aggregated ONCE per JVM+sfDir
    * into a persisted state parquet — the deployment shape — and the
    * timed query merges the delta's partials into it. The oracle
    * aggregates the union directly: merge(state, delta) must equal the
    * from-scratch aggregate exactly. */
  def q63IncrAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAgg
    val docs = Tables.parallel(s, dir, "documents")
    val keys = Seq("source", "lang")
    val delta = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val state = IncrementalAgg.readState(s, aggStateFor(s, dir, docs))
    IncrementalAgg.finalize(
        IncrementalAgg.merge(keys, state,
          IncrementalAgg.partials(delta, keys, "n_chars")))
      .orderBy("source", "lang")
  }

  /** One history-state build per (JVM, sfDir): q63's timed region is
    * the daily merge, not the one-time backfill it amortizes (the q51
    * index pattern). */
  private val aggStates =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def aggStateFor(
      s: SparkSession, dir: String, docs: DataFrame): String =
    aggStates.computeIfAbsent(dir, { _ =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_incagg").toString
      graft.operators.IncrementalAgg.writeState(
        graft.operators.IncrementalAgg.partials(
          docs.filter(pmod(col("doc_id"), lit(10)) < 8),
          Seq("source", "lang"), "n_chars"), p)
      p
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_source_quota" -> q61SourceQuota _,
    "q62_with_fill" -> q62WithFill _,
    "q63_incr_agg" -> q63IncrAgg _)

  val oracles: Map[String, String] = Map(
    "q61_source_quota" ->
      """SELECT source, CAST(rank AS INT) AS rank, doc_id,
        |  (doc_id * 2654435761) % 1000000007 AS pri
        |FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS rank
        |  FROM documents) t
        |WHERE rank <= 15
        |ORDER BY source, rank""".stripMargin,
    "q62_with_fill" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS sum_val
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
        |      FROM c GROUP BY 1),
        |g AS (SELECT event_type,
        |        unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        |      FROM s)
        |SELECT g.event_type, g.bucket,
        |  coalesce(c.cnt, 0) AS cnt,
        |  coalesce(c.sum_val, 0.0) AS sum_val,
        |  CAST(CASE WHEN c.cnt IS NULL THEN 1 ELSE 0 END AS INT) AS filled
        |FROM g LEFT JOIN c
        |  ON g.event_type = c.event_type AND g.bucket = c.bucket
        |ORDER BY 1, 2""".stripMargin,
    "q63_incr_agg" ->
      """SELECT source, lang,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_v,
        |  CAST(min(n_chars) AS BIGINT) AS min_v,
        |  CAST(max(n_chars) AS BIGINT) AS max_v,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_v
        |FROM documents GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)
}
