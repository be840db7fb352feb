package graft

import org.apache.spark.sql.functions._

import graft.operators.ContainmentJoin

class ContainmentJoinSpec extends SparkSuite {
  import spark.implicits._

  private val K = 3

  private def grams(text: String): Set[String] = {
    val w = text.split(" ", -1)
    (0 to w.length - K).map(i => w.slice(i, i + K).mkString(" ")).toSet
  }

  /** O(n²) reference: directed containment over string gram sets. */
  private def brute(docs: Seq[(Long, String)], t: Double)
      : Set[(Long, Long, Double)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia != ib
      ga = grams(ta)
      if ga.nonEmpty
      c = ga.count(grams(tb)).toDouble / ga.size
      if c >= t
    } yield (ia, ib, c)).toSet

  private def run(docs: Seq[(Long, String)], t: Double)
      : Set[(Long, Long, Double)] =
    ContainmentJoin.containedPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = K, minContainment = t)
      .as[(Long, Long, Double)].collect().toSet

  test("snippet inside source scores 1.0; reverse direction does not pair") {
    val src = (1 to 30).map(i => s"w$i").mkString(" ")
    val snip = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = run(Seq((1L, src), (2L, snip)), 0.9)
    assert(got === Set((2L, 1L, 1.0)))
  }

  test("identical docs pair in both directions") {
    val t = "a b c d e f"
    val got = run(Seq((1L, t), (2L, t)), 0.9)
    assert(got === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("matches brute force on 25 seeded random corpora") {
    val rnd = new scala.util.Random(11)
    (0 until 25).foreach { trial =>
      val nDocs = 3 + rnd.nextInt(5)
      // tiny vocab + short docs: dense overlaps, sub-threshold pairs,
      // gramless docs (len < K) and exact duplicates all occur
      val docs = (0 until nDocs).map { j =>
        val n = rnd.nextInt(10)
        val text =
          if (n == 0) ""
          else (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString(" ")
        (j.toLong, text)
      }
      val t = Seq(0.5, 0.75, 0.9)(rnd.nextInt(3))
      assert(run(docs, t) === brute(docs, t), s"trial $trial docs=$docs t=$t")
    }
  }

  test("t = 1.0: full-containment only, prefix shrinks to one gram") {
    // at t=1.0 the probe prefix is n - ceil(n) + 1 = 1 rarest gram;
    // blocking must still find full containments and nothing partial
    val src = (1 to 20).map(i => s"t$i").mkString(" ")
    val full = (1 to 8).map(i => s"t$i").mkString(" ")
    val partial = ((1 to 7).map(i => s"t$i") :+ "zz").mkString(" ")
    val got = run(Seq((1L, src), (2L, full), (3L, partial)), 1.0)
    assert(got.filter(_._1 == 2L) === Set((2L, 1L, 1.0)))
    assert(!got.exists { case (ia, ib, _) => ia == 3L && ib == 1L })
  }

  test("threshold boundary: exactly t kept, just below dropped") {
    // A has 4 grams, 3 shared with B -> containment 0.75
    val a = "x1 x2 x3 x4 x5 zz" // grams: x1x2x3, x2x3x4, x3x4x5, x4x5zz
    val b = "x1 x2 x3 x4 x5"    // shares the first three
    val got75 = run(Seq((1L, a), (2L, b)), 0.75)
    assert(got75.exists { case (ia, ib, c) => ia == 1L && ib == 2L && c == 0.75 })
    val got76 = run(Seq((1L, a), (2L, b)), 0.76)
    assert(!got76.exists { case (ia, ib, _) => ia == 1L && ib == 2L })
  }
}
