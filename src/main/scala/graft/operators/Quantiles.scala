package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles, sort-based.
  *
  * Spark's built-in `percentile` aggregate buffers a value→count map of
  * EVERY group value inside ObjectHashAggregate — the partial aggregates
  * are as large as the data, so map-side combine reduces nothing and the
  * shuffle + serialization cost is O(data) per attempt (measured 3× the
  * whole-query cost of the sort form at sf0.1). This operator instead
  * ranks values with a window over one hash-shuffle-by-key sort —
  * every row crosses the wire exactly once, sorting distributes/spills,
  * and the final aggregate keeps only the 2 boundary rows per quantile —
  * then interpolates exactly like SQL `percentile_cont` / DuckDB
  * `quantile_cont`: index (n-1)·p, linear between floor/ceil neighbors.
  *
  * For very low group cardinality the sort parallelism is bounded by
  * group count (same bound applies to the final reduce of any grouped
  * aggregate); for high-cardinality approximate needs use
  * `percentile_approx` (t-digest) instead.
  */
object Quantiles {

  def exact(
      df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[(Double, String)], scale: Int = 4): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val wn = Window.partitionBy(col(keyCol))
    val ranked = df
      .select(col(keyCol), col(valCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))

    val aggs: Seq[Column] = ps.flatMap { case (p, name) =>
      val idx = (col("__n") - 1) * lit(p)      // 0-based fractional index
      val lo = floor(idx) + 1                  // 1-based rank of lower neighbor
      Seq(
        max(when(col("__rn") === lo, col("__v"))).as(s"__lo_$name"),
        max(when(col("__rn") === lo + 1, col("__v"))).as(s"__hi_$name"),
        max(idx - floor(idx)).as(s"__f_$name")) // per-group constant
    }
    val outs: Seq[Column] = ps.map { case (_, name) =>
      val vLo = col(s"__lo_$name")
      val vHi = coalesce(col(s"__hi_$name"), vLo) // p = 1.0 has no upper
      round(vLo + col(s"__f_$name") * (vHi - vLo), scale).as(name)
    }
    ranked.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol) +: outs: _*)
  }
}
