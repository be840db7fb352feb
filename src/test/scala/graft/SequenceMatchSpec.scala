package graft

import org.apache.spark.sql.functions._

import graft.functions.SequencePattern
import graft.functions.SequencePattern.{AnyGap, Compiled, Direct, TimeGap}
import graft.operators.SequenceMatch

/** ClickHouse sequenceMatch/sequenceCount: pattern compiler goldens,
  * every separator form against hand-computed cases, and the DP matcher
  * + greedy counter against a brute-force enumerate-all-chains model on
  * random event streams. */
class SequenceMatchSpec extends SparkSuite {

  // ---- brute-force model: enumerate every strictly-increasing index
  // chain satisfying the separators; earliest-end greedy for count ----
  private def chainOk(
      ts: Array[Long], masks: Array[Long], c: Compiled,
      chain: List[Int]): Boolean =
    chain.zip(chain.tail).zipWithIndex.forall { case ((p, q), i) =>
      c.seps(i) match {
        case Direct => q == p + 1
        case AnyGap => q > p
        case TimeGap(op, v) =>
          val d = ts(q) - ts(p)
          op match {
            case 0 => d < v; case 1 => d <= v; case 2 => d > v
            case 3 => d >= v; case 4 => d == v
          }
      }
    }

  private def allChains(
      n: Int, masks: Array[Long], c: Compiled, from: Int): Seq[List[Int]] = {
    def rec(step: Int, minPos: Int): Seq[List[Int]] =
      if (step == c.conds.length) Seq(Nil)
      else (minPos until n).flatMap { p =>
        if ((masks(p) & (1L << (c.conds(step) - 1))) != 0L)
          rec(step + 1, p + 1).map(p :: _)
        else Seq.empty
      }
    rec(0, from + 1)
  }

  private def bruteEarliestEnd(
      ts: Array[Long], masks: Array[Long], c: Compiled, from: Int): Int = {
    val ends = allChains(ts.length, masks, c, from)
      .filter(ch => chainOk(ts, masks, c, ch)).map(_.last)
    if (ends.isEmpty) -1 else ends.min
  }

  private def bruteCount(ts: Array[Long], masks: Array[Long], c: Compiled): Long = {
    var cnt = 0L; var from = -1
    var e = bruteEarliestEnd(ts, masks, c, from)
    while (e >= 0) { cnt += 1; from = e; e = bruteEarliestEnd(ts, masks, c, from) }
    cnt
  }

  test("compile: grammar forms and rejects") {
    val c = SequencePattern.compile("(?1)(?t<=900)(?2).*(?3)(?10)")
    assert(c.conds.toSeq === Seq(1, 2, 3, 10))
    assert(c.seps.toSeq === Seq(TimeGap(1, 900000000L), AnyGap, Direct))
    assert(SequencePattern.compile("(?2)(?t>0)(?1)").seps.toSeq ===
      Seq(TimeGap(2, 0L)))
    assert(SequencePattern.compile("(?1)(?t==5)(?1)").seps.toSeq ===
      Seq(TimeGap(4, 5000000L)))
    for (bad <- Seq("", ".*(?1)", "(?t<5)(?1)", "(?1)(?t<5)", "(?1).*",
        "(?0)(?1)", "(?63)", "(?1)xx(?2)", "(?1).*(?t<5)(?2)"))
      intercept[IllegalArgumentException](SequencePattern.compile(bad))
  }

  test("golden: each separator form") {
    //            pos:   0    1    2    3    4
    val ts = Array(0L, 10L, 20L, 30L, 40L).map(_ * 1000000L)
    val m = Array(1L, 2L, 1L, 2L, 4L) // conds: 1@{0,2}, 2@{1,3}, 3@{4}
    def ok(p: String) =
      SequencePattern.matches(ts, m, SequencePattern.compile(p))
    assert(ok("(?1)(?2)"))        // adjacent 0,1
    assert(ok("(?2)(?1)"))        // adjacent 1,2
    assert(!ok("(?3)(?1)"))       // 3 is last
    assert(ok("(?1).*(?3)"))
    assert(!ok("(?3).*(?1)"))
    assert(ok("(?1)(?t<=10)(?2)"))   // 0->1 is 10s
    assert(!ok("(?1)(?t<10)(?2)"))   // both 1->2 hops are exactly 10s... 0->3 is 30s
    assert(ok("(?1)(?t>=30)(?2)"))   // 0->3
    assert(!ok("(?1)(?t>30)(?2)"))   // max 1->2 gap is 30
    assert(!ok("(?1)(?t==20)(?2)"))  // 1->2 gaps are 10, 30, 10 — never 20
    assert(ok("(?2)(?t==20)(?2)"))   // pos1(t10) -> pos3(t30)
  }

  test("golden time-== branches re-derived") {
    // explicit: cond1 at t=0 and t=20, cond2 at t=10 and t=30
    val ts = Array(0L, 10L, 20L, 30L).map(_ * 1000000L)
    val m = Array(1L, 2L, 1L, 2L)
    def ok(p: String) =
      SequencePattern.matches(ts, m, SequencePattern.compile(p))
    assert(ok("(?1)(?t==10)(?2)"))   // 0->10 or 20->30
    assert(ok("(?1)(?t==30)(?2)"))   // 0->30
    assert(!ok("(?1)(?t==20)(?2)"))  // gaps are 10, 30
  }

  test("count: non-overlapping earliest-end greedy") {
    // cond1 at 0,10,40; cond2 at 20,30,50 (w=25s): matches (0,20) then
    // (40,50) — the (10,30) chain overlaps the first match's span but
    // NOT its events; greedy restarts after end=20, so (30) pairs with
    // a=10? no: a must be > end(=pos of 20). a=40,b=50. => 2
    val ts = Array(0L, 10L, 20L, 30L, 40L, 50L).map(_ * 1000000L)
    val m = Array(1L, 1L, 2L, 2L, 1L, 2L)
    val c = SequencePattern.compile("(?1)(?t<=25)(?2)")
    assert(SequencePattern.countNonOverlapping(ts, m, c) === 2L)
    assert(bruteCount(ts, m, c) === 2L)
  }

  test("randomized parity vs brute force (match + count, all separators)") {
    val rnd = new scala.util.Random(7)
    val patterns = Seq(
      "(?1).*(?2)", "(?1)(?2)", "(?1)(?t<=30)(?2)", "(?1)(?t>25)(?2)",
      "(?1)(?t>=40)(?3)", "(?2)(?t<15)(?1)", "(?1)(?t==20)(?2)",
      "(?1)(?t<=40)(?2)(?t<=40)(?3)", "(?1)(?2)(?3)", "(?3).*(?2).*(?1)",
      "(?1)(?t<=60)(?2).*(?3)", "(?2)(?t>10)(?2)", "(?1)(?1)(?1)")
      .map(SequencePattern.compile(_))
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(14)
      var t = 0L
      val ts = (0 until n).map { _ => t += (5 + rnd.nextInt(20)); t * 1000000L }.toArray
      val masks = (0 until n)
        .map(_ => 1L << rnd.nextInt(3)).toArray // one cond per event, 1..3
      for (c <- patterns) {
        assert(SequencePattern.matches(ts, masks, c) ===
          (bruteEarliestEnd(ts, masks, c, -1) >= 0),
          s"match trial=$trial conds=${c.conds.toSeq} seps=${c.seps.toSeq} " +
            s"ts=${ts.toSeq} masks=${masks.toSeq}")
        assert(SequencePattern.countNonOverlapping(ts, masks, c) ===
          bruteCount(ts, masks, c),
          s"count trial=$trial conds=${c.conds.toSeq} seps=${c.seps.toSeq} " +
            s"ts=${ts.toSeq} masks=${masks.toSeq}")
      }
    }
  }

  test("multi-condition events (overlapping masks) and reuse across steps") {
    val rnd = new scala.util.Random(13)
    val patterns = Seq("(?1)(?t<=30)(?1)", "(?1).*(?2)(?3)", "(?2)(?1)")
      .map(SequencePattern.compile(_))
    for (trial <- 0 until 150) {
      val n = 1 + rnd.nextInt(10)
      var t = 0L
      val ts = (0 until n).map { _ => t += (5 + rnd.nextInt(20)); t * 1000000L }.toArray
      val masks = (0 until n).map(_ => 1L + rnd.nextInt(7)).toArray // subsets of {1,2,3}
      for (c <- patterns) {
        assert(SequencePattern.matches(ts, masks, c) ===
          (bruteEarliestEnd(ts, masks, c, -1) >= 0), s"trial=$trial")
        assert(SequencePattern.countNonOverlapping(ts, masks, c) ===
          bruteCount(ts, masks, c), s"trial=$trial")
      }
    }
  }

  test("DataFrame wiring: collectSequences + expressions end to end") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view@0, click@100, purchase@200 (+ an ignored type)
      (1L, 0L, "view"), (1L, 50L, "other"), (1L, 100L, "click"),
      (1L, 200L, "purchase"),
      // user 2: click before view only
      (2L, 0L, "click"), (2L, 100L, "view"))
      .toDF("user_id", "off", "ty")
      .select(col("user_id"),
        timestamp_micros(col("off") * 1000000L).as("ts"), col("ty"))
    val seqs = SequenceMatch.collectSequences(ev, "user_id", "ts",
      Seq(col("ty") === "view", col("ty") === "click", col("ty") === "purchase"))
    val out = seqs.select(col("user_id"),
        SequenceMatch.matchPattern(col("__ev"), "(?1)(?2)(?3)").as("adj"),
        SequenceMatch.matchPattern(col("__ev"), "(?1)(?t<=150)(?2)").as("vc"),
        SequenceMatch.countPattern(col("__ev"), "(?1).*(?2)").as("n"))
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
      r.getLong(3))).toSeq === Seq((1L, true, true, 1L), (2L, false, false, 0L)))
  }
}
