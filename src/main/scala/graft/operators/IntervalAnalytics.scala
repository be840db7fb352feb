package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse interval aggregates re-expressed as window plans:
  * `intervalLengthSum` (total length of the union of per-key intervals)
  * and `maxIntersections` / `maxIntersectionsPosition` (peak number of
  * concurrently-open intervals and the earliest point where the peak is
  * reached).
  *
  * Both are the classic sweep-line algorithms, expressed declaratively so
  * Catalyst plans them as ONE key-hash exchange + in-partition sort —
  * the state per key never exceeds a running counter, so the shape holds
  * at any corpus size provided no single key's interval count exceeds a
  * partition (the same per-key caveat every ClickHouse
  * `-Array`/sequence aggregate carries).
  *
  * Reference anchor: the sinker feeds ClickHouse tables whose analytics
  * layer leans on these aggregates for uptime/overlap accounting
  * (intervalLengthSum, maxIntersections are stock CH aggregate
  * functions); semantics follow ClickHouse's half-open reading where a
  * touching pair `[1,2) [2,3)` does NOT overlap but merges to length 2.
  */
object IntervalAnalytics {

  /** Per-key total length of the union of `[start, end)` intervals
    * (ClickHouse `intervalLengthSum`). Overlapping or touching
    * intervals are merged (gaps-and-islands); zero/negative-length
    * intervals contribute nothing. Output: (key, interval_length_sum),
    * one row per key.
    *
    * Plan: one hash exchange on `keyCol`; the island detection and the
    * two-level sum reuse the same partitioning.
    */
  def intervalLengthSum(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(endCol))
    val clean = df.filter(col(endCol) > col(startCol))
    clean
      .withColumn("__pmax", max(col(endCol)).over(w))
      // strictly greater: touching intervals ([1,2) then [2,3)) merge
      .withColumn("__isl",
        sum(when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L)).over(wRun))
      .groupBy(col(keyCol), col("__isl"))
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"))
      .groupBy(col(keyCol))
      .agg(sum(col("__e") - col("__s")).as("interval_length_sum"))
  }

  /** Per-key peak concurrency over `[start, end)` intervals (ClickHouse
    * `maxIntersections` + `maxIntersectionsPosition`). Output one row
    * per key: (key, max_intersections, position) where `position` is
    * the smallest sweep point at which the peak count is first open.
    *
    * Sweep: each interval contributes (+1 at start, −1 at end); at a
    * tied point the −1 sorts first, which is exactly the half-open
    * reading ([1,2) and [2,3) never intersect). Plan: one explode (2×
    * row fan-out) + one key-hash exchange shared by the running-sum
    * window and the final aggregate.
    */
  def maxIntersections(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val clean = df.filter(col(endCol) > col(startCol))
    val deltas = clean.select(
      col(keyCol),
      explode(array(
        struct(col(startCol).as("p"), lit(1L).as("d")),
        struct(col(endCol).as("p"), lit(-1L).as("d")))).as("ev"))
      .select(col(keyCol), col("ev.p").as("p"), col("ev.d").as("d"))
    val wRun = Window.partitionBy(keyCol).orderBy(col("p"), col("d"))
    val open = deltas.withColumn("__open", sum(col("d")).over(wRun))
    open.groupBy(col(keyCol))
      .agg(
        max(col("__open")).as("max_intersections"),
        min_by(struct(col("p"), col("d")), struct(
          -col("__open"), col("p"), col("d"))).getField("p").as("position"))
  }
}
