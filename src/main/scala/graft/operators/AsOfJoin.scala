package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the payload of the most
  * recent right row with `right.time <= left.time` on the same key
  * (feature lookup / point-in-time-correct join — the op ML pipelines
  * need to avoid feature leakage).
  *
  * NOT implemented as a range join: a range theta-join explodes to
  * O(|L|·|R|) per key before its window-filter, and Spark would plan a
  * broadcast-nested-loop. Instead: union both sides tagged, ONE hash
  * shuffle by key, sort within partitions by (time, tag), and
  * carry-forward the latest right payload with a running `last(…,
  * ignoreNulls)` window. Cost at any scale = one shuffle of L+R plus a
  * per-partition sort — the same bill as a plain join on the key; no row
  * amplification, skew handled by sort-spill.
  *
  * Tie semantics: a right row at exactly left.time IS visible (tag
  * orders right before left within equal timestamps) — matching
  * `ON l.time >= r.time` in DuckDB/pandas `merge_asof`. Equal-time
  * right rows resolve deterministically by the extra `tieCols` ordering
  * (last one wins).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      leftCols: Seq[String], rightCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val lStructT = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rStructT = right.select(struct(rightCols.map(col): _*)).schema.head.dataType
    // Tie columns keep their own types and order lexicographically; left
    // rows carry typed nulls (their tie value never matters — __tag
    // already orders them after every right row at equal time).
    val tieTypes = tieCols.map(c => right.select(col(c)).schema.head.dataType)
    val tieNames = tieCols.indices.map(i => s"__tie$i")
    val rTies = tieCols.zip(tieNames).map { case (c, n) => col(c).as(n) }
    val lTies = tieTypes.zip(tieNames).map { case (t, n) => lit(null).cast(t).as(n) }

    val r = right.select(Seq(
      col(keyCol).as("__k"), col(timeCol).as("__t"),
      lit(null).cast(lStructT).as("__l"),
      struct(rightCols.map(col): _*).as("__r"),
      lit(0).as("__tag")) ++ rTies: _*)
    val l = left.select(Seq(
      col(keyCol).as("__k"), col(timeCol).as("__t"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rStructT).as("__r"),
      lit(1).as("__tag")) ++ lTies: _*)

    // (time, tag, ties...): right rows sort before left at equal time, so
    // an exactly-simultaneous right row is visible to the left row; equal
    // -time right rows resolve by the tie columns, last one wins.
    val w = Window.partitionBy(col("__k"))
      .orderBy(Seq(col("__t"), col("__tag")) ++ tieNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val out: Seq[Column] =
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightCols.map(c => col("__carried").getField(c).as(c))
    r.unionByName(l)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(out: _*)
  }
}
