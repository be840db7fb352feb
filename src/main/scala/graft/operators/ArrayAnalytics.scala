package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ClickHouse array-function analytics over per-key ordered series:
  * `arrayDifference`, `arrayCumSum` (final value), `arrayCompact`
  * (adjacent-dedup run count) and `boundingRatio`, expressed with
  * Spark's native higher-order functions (`transform` / `filter` /
  * `aggregate` / `element_at`) over ONE collected array per key — the
  * ClickHouse `groupArray`-then-array-functions idiom.
  *
  * Scale shape: one key-hash exchange; each key's series is gathered
  * into a single array (the same per-key memory contract as every CH
  * `groupArray` consumer — CH builds exactly this array in its
  * aggregate state). All arithmetic that feeds a reduction is DECIMAL
  * (values carry fixed decimals), so results are order-independent;
  * the collect is made deterministic by sorting the (t, tie, v, node)
  * structs, not by assuming input order.
  */
object ArrayAnalytics {

  /** Per-key series profile: (key, n_events, max_jump, n_drops, n_runs,
    * total, bounding_ratio) —
    *  - max_jump: max consecutive delta (CH `arrayMax(arrayDifference)`)
    *  - n_drops: count of negative deltas
    *  - n_runs: adjacent-distinct runs of `nodeCol` (CH
    *    `length(arrayCompact(...))`)
    *  - total: exact sum (CH `arraySum` over the same array)
    *  - bounding_ratio: (v_last − v_first)/(t_last − t_first) — CH
    *    `boundingRatio(t, v)` with t scaled to SECONDS (a per-µs slope
    *    would vanish under rounding); NULL when the time span is 0.
    * Keys with a single event are dropped (deltas undefined) — filter
    * mirrors the oracle's HAVING. */
  def seriesProfile(
      df: DataFrame, keyCol: String, timeCol: String, tieCol: String,
      valCol: String, nodeCol: String): DataFrame = {
    val v = col(valCol).cast(DecimalType(18, 4))
    val evs = df
      // CH groupArray skips NULLs; without this filter a single NULL
      // value would null-poison the aggregate() fold while a SQL
      // oracle's sum() skips it
      .filter(col(valCol).isNotNull && col(nodeCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(timeCol)).as("t"), col(tieCol).as("tie"),
        v.as("v"), col(nodeCol).as("node")))).as("__evs"))
      .filter(size(col("__evs")) >= 2)
    val vs = transform(col("__evs"), e => e.getField("v"))
    // arrayDifference: head slot is NULL (CH emits 0 there; the NULL
    // form lets the reductions below skip it without a sentinel)
    val diffs = transform(vs, (x, i) =>
      when(i === 0, lit(null).cast(DecimalType(19, 4)))
        .otherwise(x - element_at(vs, i)))
    val nodes = transform(col("__evs"), e => e.getField("node"))
    val runBreaks = filter(
      transform(nodes, (x, i) => i > 0 && x =!= element_at(nodes, i)),
      b => b)
    val total = aggregate(vs, lit(0).cast(DecimalType(28, 4)),
      (acc, x) => (acc + x).cast(DecimalType(28, 4)))
    val tFirst = element_at(col("__evs"), 1).getField("t")
    val tLast = element_at(col("__evs"), -1).getField("t")
    val vFirst = element_at(col("__evs"), 1).getField("v")
    val vLast = element_at(col("__evs"), -1).getField("v")
    evs.select(
      col(keyCol),
      size(col("__evs")).cast("long").as("n_events"),
      array_max(filter(diffs, d => d.isNotNull)).cast("double")
        .as("max_jump"),
      size(filter(diffs, d => d < 0)).cast("long").as("n_drops"),
      (size(runBreaks) + 1).cast("long").as("n_runs"),
      total.cast("double").as("total"),
      when(tLast > tFirst,
        round((vLast - vFirst).cast("double") /
          ((tLast - tFirst).cast("double") / lit(1000000.0d)), 9))
        .as("bounding_ratio"))
  }
}
