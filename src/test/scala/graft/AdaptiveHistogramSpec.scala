package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.AdaptiveHistogram

/** Ben-Haim/Tom-Toub histogram: exact frequency table whenever distinct
  * values fit the bin budget (any partitioning), and the order-invariant
  * envelope (bin count, total weight, exact first moment, sorted support
  * inside [min, max]) when they don't. */
class AdaptiveHistogramSpec extends SparkSuite {

  private def hist(values: Seq[Double], bins: Int, parts: Int) = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(AdaptiveHistogram.histogram(col("v"), bins).as("h"))
      .select(explode(col("h")).as("e"))
      .select(col("e.x"), col("e.w"))
      .as[(Double, Long)].collect().toSeq.sortBy(_._1)
  }

  test("distinct <= bins: exact value/count table at any partitioning") {
    val rnd = new Random(1)
    val values = (1 to 5000).map(_ => (rnd.nextInt(40) + 1).toDouble)
    val expected = values.groupBy(identity).map { case (v, g) =>
      (v, g.size.toLong)
    }.toSeq.sortBy(_._1)
    for (parts <- Seq(1, 7))
      assert(hist(values, bins = 64, parts = parts) === expected)
  }

  test("over capacity: bounded bins, exact weight and first moment") {
    val rnd = new Random(2)
    val values = (1 to 2000).map(_ => rnd.nextDouble() * 100)
    val h = hist(values, bins = 8, parts = 5)
    assert(h.size === 8)
    assert(h.map(_._2).sum === 2000L)
    val histMean = h.map { case (x, w) => x * w }.sum / 2000d
    val dataMean = values.sum / 2000d
    assert(math.abs(histMean - dataMean) < 1e-9,
      "centroid merging preserves sum(x*w) exactly")
    assert(h.map(_._1) === h.map(_._1).sorted)
    assert(h.head._1 >= values.min && h.last._1 <= values.max)
  }

  test("nulls are ignored; empty input yields empty histogram") {
    import spark.implicits._
    val out = Seq[Option[Double]](Some(1.0), None, Some(1.0))
      .toDF("v")
      .agg(AdaptiveHistogram.histogram(col("v"), 4).as("h"))
      .select(size(col("h"))).collect().head.getInt(0)
    assert(out === 1)
    val empty = Seq.empty[Double].toDF("v")
      .agg(AdaptiveHistogram.histogram(col("v"), 4).as("h"))
      .select(size(col("h"))).collect().head.getInt(0)
    assert(empty === 0)
  }
}
