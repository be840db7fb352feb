package graft

import org.apache.spark.sql.functions._

import graft.operators.ArrayAnalytics

class ArrayAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Double, String)]) =
    ArrayAnalytics.seriesProfile(
      rows.toDF("k", "__us", "tie", "v", "node")
        .withColumn("ts", timestamp_micros(col("__us"))),
      "k", "ts", "tie", "v", "node")
      .select("k", "n_events", "max_jump", "n_drops", "n_runs", "total",
        "bounding_ratio")
      .as[(Long, Long, Double, Long, Long, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap

  test("profile on a hand-checked series") {
    // k=1 ordered values: 1.0, 3.5, 2.0, 2.0, 6.0 (ties on ts broken
    // by tie); nodes: a a b b a → 3 runs
    val got = run(Seq(
      (1L, 0L, 0L, 1.0, "a"), (1L, 10L, 0L, 3.5, "a"),
      (1L, 20L, 1L, 2.0, "b"), (1L, 20L, 2L, 2.0, "b"),
      (1L, 30L, 0L, 6.0, "a")))
    val (_, n, maxJump, drops, runs, total, br) = got(1L)
    assert(n === 5L)
    assert(maxJump === 4.0)       // 2.0 → 6.0
    assert(drops === 1L)          // 3.5 → 2.0
    assert(runs === 3L)           // a|b|a
    assert(total === 14.5)
    // (6.0 − 1.0) / (30 µs / 1e6 s)
    assert(br === Some(math.rint(5.0 / (30.0 / 1e6) * 1e9) / 1e9))
  }

  test("single-event keys are dropped; zero time-span → null ratio") {
    val got = run(Seq(
      (1L, 0L, 0L, 1.0, "a"),
      (2L, 5L, 0L, 1.0, "a"), (2L, 5L, 1L, 3.0, "a")))
    assert(!got.contains(1L))
    val (_, n, maxJump, _, _, _, br) = got(2L)
    assert(n === 2L)
    assert(maxJump === 2.0)
    assert(br === None)
  }

  test("profile matches a linear-scan model on seeded random series") {
    val rnd = new scala.util.Random(31)
    val rows = (1L to 15L).flatMap { k =>
      Seq.tabulate(2 + rnd.nextInt(40))(i =>
        (k, rnd.nextInt(1000).toLong, i.toLong,
          math.rint(rnd.nextDouble() * 1e4) / 100.0,
          "n" + rnd.nextInt(3)))
    }
    val got = run(rows)
    for ((k, rs) <- rows.groupBy(_._1)) {
      val s = rs.sortBy(r => (r._2, r._3))
      val vs = s.map(_._4)
      val diffs = vs.zip(vs.drop(1)).map { case (a, b) =>
        math.rint((b - a) * 1e4) / 1e4 } // exact at 2 decimals
      val runs = 1 + s.map(_._5).sliding(2).count {
        case Seq(a, b) => a != b; case _ => false }
      val (_, n, maxJump, drops, nRuns, total, _) = got(k)
      assert(n === s.size.toLong)
      assert(math.abs(maxJump - diffs.max) < 1e-9, s"k=$k")
      assert(drops === diffs.count(_ < 0).toLong)
      assert(nRuns === runs.toLong)
      assert(math.abs(total - vs.sum) < 1e-6)
    }
  }
}
