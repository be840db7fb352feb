package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series gap filling — ClickHouse's `ORDER BY … WITH FILL`
  * (docs: sql-reference/statements/select/order-by#order-by-expr-with-fill)
  * re-expressed as a declarative plan: a reporting query over sparse
  * event buckets must emit EVERY bucket of each series between that
  * series' first and last observation, with absent buckets filled by
  * the column defaults (0 for counts/sums), so dashboards and
  * downstream window passes see a dense, regular grid.
  *
  * Plan shape, all linear: (1) one partial-aggregated shuffle to bucket
  * counts per series; (2) a tiny per-series span aggregate (2 timestamps
  * per series); (3) `sequence(min, max, step)` exploded into the dense
  * grid — rows bounded by series × calendar range, independent of event
  * volume; (4) one equi-join grid←buckets on (series, bucket). No
  * window functions, no per-series sort; a series with a billion events
  * still contributes only its bucket count to everything after (1).
  */
object GapFill {

  /** Dense (series, bucket) grid between each series' min and max
    * bucket at `step` (a calendar-interval literal, e.g. "1 hour"),
    * left-joined to the given aggregates; absent buckets take
    * `fillValue` for every aggregate column and `filled = 1`.
    *
    * `aggs` maps output column name → aggregate over the raw rows
    * (evaluated per (series, bucket) group). Columns named in
    * `interpolate` (ClickHouse `WITH FILL … INTERPOLATE`) carry the
    * last observed value forward across gaps instead of taking
    * `fillValue` — this is the one path that uses a window, and it
    * runs over the DENSE GRID, whose per-series row count is bounded
    * by the calendar range at `step`, not by event volume, so the
    * per-series sort stays safe at any data scale. The grid starts at
    * each series' first observation, so an interpolated column is
    * never null.
    */
  def fillTimeBuckets(
      df: DataFrame, seriesCol: String, tsCol: String, step: String,
      aggs: Seq[(String, Column)], fillValue: Double = 0.0,
      interpolate: Seq[String] = Nil): DataFrame = {
    require(interpolate.forall(n => aggs.exists(_._1 == n)),
      "interpolate names must be aggregate columns")
    val bucketed = df
      .select(col(seriesCol).as("series"),
        date_trunc(stepUnit(step), col(tsCol)).as("bucket"),
        col("*"))
      .groupBy(col("series"), col("bucket"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val spans = bucketed.groupBy(col("series"))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
    val grid = spans.select(col("series"),
      explode(expr(s"sequence(__mn, __mx, interval $step)")).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    val filledCols = aggs.map { case (n, _) =>
      if (interpolate.contains(n)) last(col(n), ignoreNulls = true).over(w).as(n)
      else coalesce(col(n), lit(fillValue).cast(bucketed.schema(n).dataType)).as(n)
    }
    grid.join(bucketed, Seq("series", "bucket"), "left")
      .select(Seq(col("series"), col("bucket")) ++ filledCols :+
        when(col(aggs.head._1).isNull, 1).otherwise(0).cast("int").as("filled"): _*)
  }

  /** date_trunc unit of a "1 hour"-style step literal (the fill grid
    * must align to the step's own calendar unit). */
  private def stepUnit(step: String): String = step.trim.split("\\s+") match {
    case Array("1", u) => u.toLowerCase
    case other => throw new IllegalArgumentException(
      s"step must be '1 <unit>' for aligned fill, got '$step'")
  }
}
