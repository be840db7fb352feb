package graft

import org.apache.spark.sql.functions._

import graft.operators.Downsample

class DownsampleSpec extends SparkSuite {
  import spark.implicits._

  // --- M4 -------------------------------------------------------------

  test("m4: min/max/first/last per bucket, tie-broken by tieCol") {
    val rows = Seq(
      // bucket 0: ties on ts — event_id orders first/last
      (1L, 5L, 1L, 10.0), (1L, 5L, 2L, 30.0), (1L, 5L, 0L, 20.0),
      (1L, 7L, 3L, 5.0),
      // bucket 1
      (1L, 12L, 4L, 40.0))
      .toDF("k", "__us", "tie", "v")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = Downsample.m4(rows, "k", "ts", "tie", "v", bucketUs = 10L)
      .select("k", "bucket", "n", "v_first", "v_min", "v_max", "v_last")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got((1L, 0L)) === ((1L, 0L, 4L, 20.0, 5.0, 30.0, 5.0)))
    assert(got((1L, 1L)) === ((1L, 1L, 1L, 40.0, 40.0, 40.0, 40.0)))
  }

  test("m4: exact bucket boundaries (no double-division drift)") {
    val b = 604800000000L // the q87 literal — a large, drift-prone divisor
    val rows = Seq((1L, b - 1, 0L, 1.0), (1L, b, 1L, 2.0),
      (1L, 2 * b - 1, 2L, 3.0), (1L, 2 * b, 3L, 4.0))
      .toDF("k", "__us", "tie", "v")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = Downsample.m4(rows, "k", "ts", "tie", "v", b)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
  }

  // --- LTTB -----------------------------------------------------------

  /** Naive LTTB reference, written independently of the operator's
    * bucket-index arithmetic (explicit double bucket edges). */
  private def naive(
      pts: Seq[(Long, Double)], threshold: Int): Seq[(Long, Double)] = {
    val p = pts.sorted
    val n = p.length
    if (n <= threshold) return p
    val out = collection.mutable.ArrayBuffer(p.head)
    val nB = threshold - 2
    def bounds(i: Int) = 1 + ((n - 2).toLong * i / nB).toInt
    var prev = p.head
    for (b <- 0 until nB) {
      val cand = p.slice(bounds(b), bounds(b + 1))
      val anchor =
        if (b == nB - 1) (p.last._1.toDouble, p.last._2)
        else {
          val nxt = p.slice(bounds(b + 1), bounds(b + 2))
          (nxt.map(_._1.toDouble).sum / nxt.size,
            nxt.map(_._2).sum / nxt.size)
        }
      val pick = cand.maxBy { c =>
        // area×2 of triangle (prev, c, anchor); maxBy keeps the FIRST max
        math.abs((prev._1 - anchor._1) * (c._2 - prev._2) -
          (prev._1 - c._1) * (anchor._2 - prev._2))
      }
      out += pick
      prev = pick
    }
    out += p.last
    out.toSeq
  }

  test("lttb: short series pass through unchanged") {
    val pts = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 9L, 0.5))
      .toDF("k", "__us", "v")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = Downsample.lttb(pts, "k", "ts", "v", threshold = 5)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got.toSeq === Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 9L, 0.5)))
  }

  test("lttb: keeps endpoints, keeps the spike") {
    // flat line with one spike: the spike's bucket must pick the spike
    val raw = (0L until 100L).map(t => (t, if (t == 37L) 50.0 else 1.0))
    val df = raw.map { case (t, v) => (1L, t, v) }.toDF("k", "__us", "v")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = Downsample.lttb(df, "k", "ts", "v", threshold = 10)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got.length === 10)
    assert(got.head._2 === 0L && got.last._2 === 99L)
    assert(got.exists(p => p._2 == 37L && p._3 == 50.0))
  }

  test("lttb matches the naive reference on seeded random series") {
    val rnd = new scala.util.Random(17)
    val rows = (1L to 6L).flatMap { k =>
      val n = 3 + rnd.nextInt(200)
      // distinct times per key (shuffled insertion order)
      rnd.shuffle((0 until n).toList).map(i =>
        (k, i * 7L + k, math.rint(rnd.nextDouble() * 1000) / 10.0))
    }
    val df = rows.toDF("k", "__us", "v")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = Downsample.lttb(df, "k", "ts", "v", threshold = 20)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(p => (p._2, p._3)).sorted.toSeq)
      .toMap
    val want = rows.groupBy(_._1).map { case (k, rs) =>
      k -> naive(rs.map(r => (r._2, r._3)), 20).sorted
    }
    assert(got === want)
  }
}
