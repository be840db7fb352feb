package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalAnalytics

class IntervalAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("k", "s", "e")

  // --- intervalLengthSum ---------------------------------------------

  test("union length: overlap merges, touching merges, gap splits") {
    // [0,10) ∪ [5,15) = 15; [15,20) touches → one island of 20;
    // [30,31) after a gap → +1
    val got = IntervalAnalytics
      .intervalLengthSum(df(Seq((1L, 0L, 10L), (1L, 5L, 15L),
        (1L, 15L, 20L), (1L, 30L, 31L))), "k", "s", "e")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 21L)
  }

  test("union length: zero/negative intervals contribute nothing") {
    val got = IntervalAnalytics
      .intervalLengthSum(df(Seq((1L, 5L, 5L), (1L, 9L, 3L), (1L, 0L, 2L))),
        "k", "s", "e")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 2L)
  }

  test("union length: contained interval does not extend the island") {
    val got = IntervalAnalytics
      .intervalLengthSum(df(Seq((1L, 0L, 100L), (1L, 10L, 20L))), "k", "s", "e")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 100L)
  }

  test("union length matches a boolean-timeline model on random sets") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 10L).flatMap { k =>
      Seq.fill(1 + rnd.nextInt(20)) {
        val s = rnd.nextInt(200).toLong
        (k, s, s + rnd.nextInt(30).toLong)
      }
    }
    val model = rows.groupBy(_._1).map { case (k, iv) =>
      val line = Array.fill(300)(false)
      iv.foreach { case (_, s, e) =>
        (s until e).foreach(i => line(i.toInt) = true) }
      k -> line.count(identity).toLong
    }
    val got = IntervalAnalytics.intervalLengthSum(df(rows), "k", "s", "e")
      .as[(Long, Long)].collect().toMap
    // keys whose every interval is empty are absent on both sides
    assert(got === model.filter(_._2 > 0L))
  }

  // --- maxIntersections ----------------------------------------------

  test("max intersections: peak count and earliest peak position") {
    val rows = df(Seq(
      (1L, 0L, 10L), (1L, 10L, 20L),            // never overlap → peak 1 at 0
      (2L, 0L, 10L), (2L, 5L, 15L), (2L, 7L, 8L), // peak 3 opens at 7
      (2L, 40L, 50L), (2L, 41L, 49L)))            // later peak 2 ignored (< 3)
    val got = IntervalAnalytics.maxIntersections(rows, "k", "s", "e")
      .as[(Long, Long, Long)].collect()
      .map { case (k, m, p) => k -> ((m, p)) }.toMap
    assert(got(1L) === ((1L, 0L)))
    assert(got(2L) === ((3L, 7L)))
  }

  test("max intersections: equal peaks → earliest position wins") {
    val rows = df(Seq(
      (1L, 0L, 5L), (1L, 1L, 6L),     // peak 2 opens at 1
      (1L, 10L, 15L), (1L, 11L, 16L))) // peak 2 again at 11 — not reported
    val got = IntervalAnalytics.maxIntersections(rows, "k", "s", "e")
      .as[(Long, Long, Long)].collect().head
    assert(got === ((1L, 2L, 1L)))
  }

  test("max intersections matches a sweep model on random sets") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 10L).flatMap { k =>
      Seq.fill(1 + rnd.nextInt(15)) {
        val s = rnd.nextInt(100).toLong
        (k, s, s + 1 + rnd.nextInt(20).toLong)
      }
    }
    // point model: count at integer point p is |{[s,e) : s <= p < e}|;
    // counts only change at interval endpoints, so the first integer
    // point achieving the max IS the opening interval's start
    val model = rows.groupBy(_._1).map { case (k, iv) =>
      val counts = (0L to 125L).map { p =>
        (p, iv.count { case (_, s, e) => s <= p && p < e }.toLong) }
      val mx = counts.map(_._2).max
      k -> ((mx, counts.find(_._2 == mx).get._1))
    }
    val got = IntervalAnalytics.maxIntersections(df(rows), "k", "s", "e")
      .as[(Long, Long, Long)].collect()
      .map { case (k, m, p) => k -> ((m, p)) }.toMap
    assert(got === model)
  }
}
