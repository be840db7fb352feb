package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{TDigest, TDigestBuf}

/** [[graft.functions.TDigestBuf]] / [[graft.functions.TDigestQuantiles]]:
  * rank-error bounds vs exact order statistics on varied distributions,
  * merge associativity across random partitionings, serialization
  * round-trip, the ~δ centroid-count (state size) bound, and the SQL
  * aggregate against per-group exact quantiles. */
class TDigestSpec extends SparkSuite {
  import spark.implicits._

  private val comp = 200.0

  /** Empirical rank of value v in sorted data: fraction ≤ v. */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  private def digestOf(xs: Seq[Double]): TDigestBuf = {
    val d = new TDigestBuf(comp)
    xs.foreach(d.add)
    d
  }

  private def checkRankError(xs: Seq[Double], tol: Double): Unit = {
    val d = digestOf(xs)
    val sorted = xs.toArray.sorted
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)) {
      val v = d.quantile(p)
      // two-sided under ties: rank of the first value < v must not exceed
      // p, rank of values ≤ v must not fall below it, within tol
      val le = rankOf(sorted, v)
      val lt = 1.0 - rankOf(sorted.map(-_).sorted, -v)
      assert(lt - tol <= p && p <= le + tol,
        s"p=$p v=$v lt=$lt le=$le outside ±$tol (n=${xs.size})")
    }
  }

  test("rank error within 1% across distributions") {
    val rnd = new Random(5)
    checkRankError(Seq.fill(50000)(rnd.nextDouble()), 0.01)
    checkRankError(Seq.fill(50000)(math.exp(3 * rnd.nextGaussian())), 0.01)
    // heavy ties: 90% of mass on 5 values
    checkRankError(Seq.fill(30000)(
      if (rnd.nextDouble() < 0.9) rnd.nextInt(5).toDouble
      else rnd.nextDouble() * 100), 0.01)
    // tiny inputs are exact-ish
    checkRankError(Seq(1.0, 2.0, 3.0), 0.34)
  }

  test("tail accuracy beats mid-range budget (k1 scale property)") {
    val rnd = new Random(11)
    val xs = Seq.fill(100000)(rnd.nextDouble())
    val d = digestOf(xs)
    val sorted = xs.toArray.sorted
    for (p <- Seq(0.999, 0.9999)) {
      val v = d.quantile(p)
      assert(math.abs(rankOf(sorted, v) - p) <= 0.001,
        s"tail p=$p rank=${rankOf(sorted, v)}")
    }
    assert(d.quantile(0.0) === xs.min)
    assert(d.quantile(1.0) === xs.max)
  }

  test("merge of random partitionings matches single-digest accuracy") {
    val rnd = new Random(23)
    val xs = Seq.fill(40000)(rnd.nextGaussian() * 10)
    val sorted = xs.toArray.sorted
    (0 until 5).foreach { _ =>
      val nParts = 2 + rnd.nextInt(6)
      val parts = xs.grouped(xs.size / nParts + 1).toSeq
      val merged = parts.map(digestOf).reduce { (a, b) => a.mergeWith(b); a }
      for (p <- Seq(0.01, 0.5, 0.99)) {
        val v = merged.quantile(p)
        assert(math.abs(rankOf(sorted, v) - p) <= 0.015,
          s"merged p=$p rank=${rankOf(sorted, v)}")
      }
    }
  }

  test("serialization round-trips and state stays ≤ ~compression centroids") {
    val rnd = new Random(37)
    val d = digestOf(Seq.fill(200000)(rnd.nextDouble() * 1e6))
    assert(d.centroidCount <= 2 * comp.toInt,
      s"centroids=${d.centroidCount} exceeds 2δ")
    assert(d.serialize().length <= 8 * 4 + 4 + 16 * 2 * comp.toInt)
    val rt = TDigestBuf.deserialize(d.serialize())
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(rt.quantile(p) === d.quantile(p))
  }

  test("SQL grouped quantiles within 1% rank of exact, nulls skipped") {
    val rnd = new Random(71)
    val rows = Seq.tabulate(30000) { i =>
      (i % 7, if (i % 97 == 0) None else Some(rnd.nextDouble() * (1 + i % 7)))
    }
    val df = rows.toDF("g", "v").repartition(13)
    val out = df.groupBy($"g")
      .agg(TDigest.quantiles($"v".cast("double"), Seq(0.5, 0.9, 0.99)).as("qs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val vals = rs.flatMap(_._2).toArray.sorted
      out(g).zip(Seq(0.5, 0.9, 0.99)).foreach { case (v, p) =>
        assert(math.abs(rankOf(vals, v) - p) <= 0.012,
          s"g=$g p=$p v=$v rank=${rankOf(vals, v)}")
      }
    }
  }
}
