package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Per-key document quotas — the "at most n documents per domain" stage
  * of a web-corpus pipeline (RefinedWeb/C4 keep per-domain caps so head
  * domains can't dominate the training mix). Selection must be
  * deterministic (reruns and retries pick the same survivors), uniform
  * (not "first n in file order", which biases toward old crawls), and
  * skew-immune (head domains are exactly the keys with the most rows).
  *
  * All three come from ranking by a deterministic hash priority and
  * taking each key's exact smallest-n with [[graft.functions.BoundedTopN]]:
  * a mergeable bounded buffer, so the heavy lifting happens map-side in
  * partial aggregation and the shuffle carries at most n (pri,id) pairs
  * per key per map partition — a billion-doc domain costs its scan, not
  * a per-key sort. (The window-function formulation of the same quota —
  * `row_number() OVER (PARTITION BY key ORDER BY pri) <= n`, which the
  * oracle uses — sorts every row of a key in one task, exactly what
  * dies on a head domain at 100 TB.)
  */
object SourceQuota {

  /** Knuth multiplicative hash of an id — deterministic, uniform-ish,
    * non-negative for ANY id (pmod), and exactly expressible in
    * portable SQL (`((id * 2654435761) % m + m) % m`, the
    * sign-preserving-% spelling of pmod), which keeps quota selection
    * oracle-checkable without either side reimplementing xxhash. */
  def hashPriority(id: Column): Column =
    pmod(id * lit(2654435761L), lit(1000000007L))

  /** (key, rank, id, pri): the exact n smallest (pri, id) pairs per
    * key, rank 1-based in that order. One shuffle of bounded
    * summaries; no per-key sort anywhere. */
  def cap(
      df: DataFrame, keyCol: String, idCol: String, n: Int,
      priority: Column => Column = hashPriority): DataFrame = {
    val topn = ColumnBridge.col(graft.functions.BoundedTopN(
      ColumnBridge.expr(priority(col(idCol)).cast("long")),
      ColumnBridge.expr(col(idCol).cast("long")), n)
      .toAggregateExpression())
    df.groupBy(col(keyCol).as("key"))
      .agg(topn.as("__top"))
      .select(col("key"), posexplode(col("__top")).as(Seq("__i", "__p")))
      .select(col("key"), (col("__i") + 1).cast("int").as("rank"),
        col("__p.id").as("id"), col("__p.pri").as("pri"))
  }
}
