package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table — the batch analog of
  * ClickHouse's AggregatingMergeTree (the companion of the reference's
  * ReplacingMergeTree sink keying, docs/dev/design.md:6-13): a daily
  * pipeline never re-aggregates the whole lake, it merges the new
  * partition's PARTIAL aggregate states into the persisted state table.
  *
  * The state rows are mergeable algebraic summaries, one per key:
  * (cnt, sum, min, max). Merging two summaries is (+, +, min, max) —
  * associative and commutative, so merge(state(A), partials(B)) ≡
  * partials(A ∪ B) exactly, for any batch split, which is what the
  * spec pins and the q63 oracle checks end-to-end (merged result vs a
  * direct aggregate over the union in DuckDB). Derived values (avg)
  * are computed at FINALIZE time only — never stored — so they stay
  * exact under merging.
  *
  * Scale shape: partials(delta) is one partial-aggregated shuffle of
  * the DELTA only; merge shuffles state ∪ delta-partials on the key —
  * both sides are one row per key, so daily cost is O(keys), not
  * O(lake). The state parquet is the only thing read back.
  */
object IncrementalAgg {

  /** Partial-aggregate state of `df` per `keys`:
    * (keys…, cnt, sum_v, min_v, max_v) over the long column `valueCol`. */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol)).cast("long").as("sum_v"),
        min(col(valueCol)).cast("long").as("min_v"),
        max(col(valueCol)).cast("long").as("max_v"))

  /** Merge partial-state tables (same schema) into one: the
    * AggregatingMergeTree merge rule per key. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"),
        sum(col("sum_v")).cast("long").as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Finalize a state table: derived columns computed from the exact
    * summaries (never stored in the state). */
  def finalize(state: DataFrame): DataFrame =
    // double division of two exact longs is IEEE-deterministic, so the
    // rounded value is oracle-parity-safe without a decimal detour
    state.withColumn("avg_v",
      round(col("sum_v").cast("double") / col("cnt"), 4))

  /** Persist a state table bucketed by key hash so daily merges read
    * both sides pre-partitioned (the parquet analog of the MergeTree
    * part layout). */
  def writeState(state: DataFrame, path: String, buckets: Int = 32): Unit =
    state.withColumn("__b", pmod(xxhash64(col(state.columns.head)), lit(buckets)))
      .write.mode("overwrite").partitionBy("__b").parquet(path)

  def readState(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path).drop("__b")
}
