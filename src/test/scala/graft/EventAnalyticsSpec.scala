package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def tsDf(rows: Seq[(Long, Long)]) =
    rows.toDF("user_id", "__us").withColumn("ts", timestamp_micros(col("__us")))

  // --- sessionize -----------------------------------------------------

  test("sessionize: gap boundary is strict, first event starts session 1") {
    val us = 1000000L
    val rows = tsDf(Seq(
      (1L, 0L), (1L, 10L * us), (1L, 20L * us + 1), // ==gap stays, >gap splits
      (2L, 5L * us)))
    val got = EventAnalytics.sessionize(rows, "user_id", "ts", 10L * us)
      .select("user_id", "__us", "session_seq")
      .as[(Long, Long, Long)].collect()
      .map { case (u, t, s) => ((u, t), s) }.toMap
    assert(got((1L, 0L)) === 1L)
    assert(got((1L, 10L * us)) === 1L)
    assert(got((1L, 20L * us + 1)) === 2L)
    assert(got((2L, 5L * us)) === 1L)
  }

  test("sessionize: tied timestamps land in the same session") {
    val rows = tsDf(Seq((1L, 42L), (1L, 42L), (1L, 42L)))
    val seqs = EventAnalytics.sessionize(rows, "user_id", "ts", 1000000L)
      .select("session_seq").as[Long].collect()
    assert(seqs.toSeq === Seq(1L, 1L, 1L))
  }

  test("sessionize matches a linear-scan model on seeded random streams") {
    val rnd = new scala.util.Random(13)
    val gap = 10L
    val events = (1L to 20L).flatMap { u =>
      val n = 1 + rnd.nextInt(15)
      // small time range forces ties and boundary gaps
      Seq.fill(n)((u, rnd.nextInt(100).toLong))
    }
    val got = EventAnalytics
      .sessionize(tsDf(events), "user_id", "ts", gap)
      .select("user_id", "__us", "session_seq")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.sortBy(_._2).map(_._3).toSeq }
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val ts = es.map(_._2).sorted
      val seqs = ts.zipWithIndex.scanLeft(0L) {
        case (s, (t, i)) =>
          if (i == 0 || t - ts(i - 1) > gap) s + 1 else s
      }.drop(1)
      u -> seqs
    }
    expected.foreach { case (u, seqs) =>
      assert(got(u) === seqs, s"user $u ts=${events.filter(_._1 == u)}")
    }
  }

  // --- funnel ---------------------------------------------------------

  /** Brute-force exists-chain model: max k such that some strictly
    * time-increasing event chain matching steps(0..k-1) fits the
    * window (t_k - t_1 <= W). Exponential — fine at test sizes. */
  private def bruteFunnel(
      events: Seq[(Long, String)], steps: Seq[String], w: Long): Int = {
    def chains(k: Int): Boolean = {
      def ext(sofar: List[Long], depth: Int): Boolean =
        if (depth == k) sofar.head - sofar.last <= w
        else events.exists { case (t, ty) =>
          ty == steps(depth) && (sofar.isEmpty || t > sofar.head) &&
            ext(t :: sofar, depth + 1)
        }
      ext(Nil, 0)
    }
    (steps.size to 1 by -1).find(chains).getOrElse(0)
  }

  private def runFunnel(events: Seq[(Long, Long, String)],
      steps: Seq[String], w: Long): Map[Long, Int] = {
    val df = events.toDF("user_id", "__us", "event_type")
      .withColumn("ts", timestamp_micros(col("__us")))
    EventAnalytics.funnelLevels(df, "user_id", "ts", "event_type", steps, w)
      .as[(Long, Int)].collect().toMap
  }

  test("funnel: matches brute force on 40 seeded random users") {
    val rnd = new scala.util.Random(7)
    val steps = Seq("s", "v", "c", "p")
    val types = Vector("s", "v", "c", "p", "x")
    val w = 50L
    // times drawn from a small range so ties, out-of-window chains and
    // rescued-by-later-start chains all occur across the 40 users
    val users = (1L to 40L).map { u =>
      val n = 1 + rnd.nextInt(12)
      u -> Seq.fill(n)((rnd.nextInt(120).toLong, types(rnd.nextInt(5))))
    }
    val all = users.flatMap { case (u, es) =>
      es.map { case (t, ty) => (u, t, ty) }
    }
    val got = runFunnel(all, steps, w)
    users.foreach { case (u, es) =>
      assert(got(u) === bruteFunnel(es, steps, w), s"user $u events=$es")
    }
    // same corpora against a funnel with a DUPLICATED step type — the
    // class of bug where a row satisfying several levels must score the
    // deepest (caught once by review, pinned here against brute force)
    val dupSteps = Seq("s", "v", "v", "c")
    val gotDup = runFunnel(all, dupSteps, w)
    users.foreach { case (u, es) =>
      assert(gotDup(u) === bruteFunnel(es, dupSteps, w),
        s"user $u (dup steps) events=$es")
    }
  }

  test("funnel: window binds on the whole chain, not per step") {
    // s@0, v@60, c@70, p@80 with W=50: every adjacent hop fits, but no
    // full chain does (80-0>50) and even level 2 fails (60-0>50).
    // A per-hop-window bug would score 4.
    val got = runFunnel(Seq((1L, 0L, "s"), (1L, 60L, "v"), (1L, 70L, "c"),
      (1L, 80L, "p")), Seq("s", "v", "c", "p"), 50L)
    assert(got(1L) === 1)
  }

  test("funnel: later chain start rescues the window") {
    // s@0 misses the window for p@105; s@60 fits (105-60<=50).
    // Greedy-earliest-start scoring would return 3.
    val got = runFunnel(Seq((1L, 0L, "s"), (1L, 60L, "s"), (1L, 70L, "v"),
      (1L, 90L, "c"), (1L, 105L, "p")), Seq("s", "v", "c", "p"), 50L)
    assert(got(1L) === 4)
  }

  test("funnel: duplicated step type scores the deepest level") {
    // steps a,b,b: b@3 completes the 3-chain (a@1, b@2, b@3) and must
    // score 3, not stop at its first-matching shallower condition
    val got = runFunnel(Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "b")),
      Seq("a", "b", "b"), 100L)
    assert(got(1L) === 3)
    // brute force agrees
    assert(bruteFunnel(Seq((1L, "a"), (2L, "b"), (3L, "b")),
      Seq("a", "b", "b"), 100L) === 3)
  }

  test("funnel: ties do not chain (strictly increasing times required)") {
    val got = runFunnel(Seq((1L, 10L, "s"), (1L, 10L, "v"), (1L, 20L, "c"),
      (1L, 30L, "p")), Seq("s", "v", "c", "p"), 100L)
    assert(got(1L) === 1) // v at t=10 cannot follow s at t=10
  }

  // --- retention ------------------------------------------------------

  test("retention: cohort by first signup week, offsets count any activity") {
    def ts(d: String) = java.sql.Timestamp.valueOf(d)
    val rows = Seq(
      // user 1 signs up week of Jan 1 (a Monday), active weeks 0 and 2
      (1L, ts("2024-01-02 10:00:00"), "signup"),
      (1L, ts("2024-01-16 10:00:00"), "click"),
      // user 2 same cohort, active week 0 only (pre-signup activity in an
      // earlier week must NOT count as an offset)
      (2L, ts("2023-12-28 10:00:00"), "view"),
      (2L, ts("2024-01-03 10:00:00"), "signup"),
      // user 3 never signs up -> excluded entirely
      (3L, ts("2024-01-02 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .cohortRetention(rows, "user_id", "ts", "event_type", "signup")
      .select("week_offset", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((0L, 2L, 2L, 1.0), (2L, 1L, 2L, 0.5)))
  }

  // --- movingAgg ------------------------------------------------------

  test("movingAgg matches a sliding-window model on seeded random streams") {
    val rnd = new scala.util.Random(29)
    val events = (1L to 15L).flatMap { u =>
      (0 until 1 + rnd.nextInt(20)).map { i =>
        // duplicate times within a user force the (time, tie) order;
        // 4-dp values keep the DECIMAL(18,4) route exact
        (u, rnd.nextInt(8).toLong, i.toLong,
          math.round(rnd.nextDouble() * 1e4) / 1e4)
      }
    }
    val df = events.toDF("user_id", "__us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("__us")))
    val n = 5
    val got = EventAnalytics
      .movingAgg(df, "user_id", "ts", "event_id", "value", n)
      .select("user_id", "event_id", "mv_sum", "mv_avg", "mv_n")
      .as[(Long, Long, Double, Double, Long)].collect()
      .map { case (u, e, s, a, c) => (u, e) -> ((s, a, c)) }.toMap
    val byUser = events.groupBy(_._1)
    for ((u, rows) <- byUser; sorted = rows.sortBy(r => (r._2, r._3));
         (row, i) <- sorted.zipWithIndex) {
      val frame = sorted.slice(math.max(0, i - n + 1), i + 1)
      // model the decimal route: exact 4-dp integer arithmetic
      val sumCents = frame.map(r => math.round(r._4 * 1e4)).sum
      val expSum = sumCents / 1e4
      val (gotSum, gotAvg, gotN) = got((u, row._3))
      assert(gotN === frame.size.toLong, s"n at ($u,${row._3})")
      assert(gotSum === expSum, s"sum at ($u,${row._3})")
      // CH semantics: avg divides by the window size n even on short
      // head frames
      val expAvg = math.round(expSum / n * 1e6) / 1e6
      assert(math.abs(gotAvg - expAvg) <= 1e-9, s"avg at ($u,${row._3})")
    }
  }

  // --- deltaSum -------------------------------------------------------

  test("deltaSum ignores resets; 0 (not NULL) when no positive delta; " +
    "the delta chain bridges NULL values") {
    val df = Seq[(Long, Long, Long, Option[Double])](
      // counter 5 -> 3 (reset, ignored) -> 8 (+5): deltaSum 5
      (1L, 1L, 1L, Some(5.0)), (1L, 2L, 2L, Some(3.0)),
      (1L, 3L, 3L, Some(8.0)),
      // strictly decreasing: no positive delta -> 0, CH-style
      (2L, 1L, 4L, Some(9.0)), (2L, 2L, 5L, Some(1.0)),
      // single event: no delta at all -> 0
      (3L, 1L, 6L, Some(7.0)),
      // 5, NULL, 8: CH skips NULLs, so the (5, 8) pair still counts
      (4L, 1L, 7L, Some(5.0)), (4L, 2L, 8L, None),
      (4L, 3L, 9L, Some(8.0)))
      .toDF("user_id", "__us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = EventAnalytics
      .deltaSum(df, "user_id", "ts", "event_id", "value")
      .select("user_id", "delta_sum")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 5.0)
    assert(got(2L) === 0.0)
    assert(got(3L) === 0.0)
    assert(got(4L) === 3.0)
  }

  test("deltaSum matches a linear-scan model on seeded random counters") {
    val rnd = new scala.util.Random(53)
    val events = (1L to 20L).flatMap { u =>
      (0 until 1 + rnd.nextInt(30)).map { i =>
        (u, rnd.nextInt(6).toLong, i.toLong, // duplicate times force ties
          math.round(rnd.nextDouble() * 1e4) / 1e4)
      }
    }
    val df = events.toDF("user_id", "__us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = EventAnalytics
      .deltaSum(df.repartition(8), "user_id", "ts", "event_id", "value")
      .select("user_id", "delta_sum")
      .as[(Long, Double)].collect().toMap
    for ((u, rows) <- events.groupBy(_._1)) {
      val vs = rows.sortBy(r => (r._2, r._3)).map(r => math.round(r._4 * 1e4))
      val exp = vs.zip(vs.drop(1)).map { case (a, b) => b - a }
        .filter(_ > 0).sum / 1e4
      assert(got(u) === exp, s"user $u")
    }
  }

  test("movingAgg head frames are shorter than n, never empty") {
    val df = Seq((1L, 1L, 1L, 2.5), (1L, 2L, 2L, 1.5), (1L, 3L, 3L, 4.0))
      .toDF("user_id", "__us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = EventAnalytics.movingAgg(df, "user_id", "ts", "event_id",
        "value", 2)
      .select("event_id", "mv_sum", "mv_avg", "mv_n")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
    // head frame: sum covers the 1 value seen, avg still divides by n=2
    assert(got === Seq((1L, 2.5, 1.25, 1L), (2L, 4.0, 2.0, 2L),
      (3L, 5.5, 2.75, 2L)))
  }

  // --- funnelLevelsModes ----------------------------------------------

  private def modesLvl(
      evs: Seq[(Long, Long, String)], steps: Seq[String], w: Long,
      dedup: Boolean = false, order: Boolean = false,
      increase: Boolean = false): Map[Long, Int] =
    EventAnalytics.funnelLevelsModes(
        evs.toDF("user_id", "__us", "event_type")
          .withColumn("ts", timestamp_micros(col("__us"))),
        "user_id", "ts", "event_type", steps, w,
        strictDedup = dedup, strictOrder = order, strictIncrease = increase)
      .select("user_id", "funnel_level").as[(Long, Int)].collect().toMap

  test("funnel modes: strict_order stops at an intervening other event") {
    // the ClickHouse doc example: A→B→D→C finds 3 by default, 2 strict
    val evs = Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "D"), (1L, 3L, "C"))
    val steps = Seq("A", "B", "C")
    assert(modesLvl(evs, steps, 100L)(1L) === 3)
    assert(modesLvl(evs, steps, 100L, order = true)(1L) === 2)
    // others BEFORE the chain start are ignored
    val pre = Seq((1L, 0L, "D"), (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"))
    assert(modesLvl(pre, steps, 100L, order = true)(1L) === 3)
  }

  test("funnel modes: strict_dedup interrupts on a repeated reached step") {
    val evs = Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "B"), (1L, 3L, "C"))
    val steps = Seq("A", "B", "C")
    assert(modesLvl(evs, steps, 100L)(1L) === 3)
    assert(modesLvl(evs, steps, 100L, dedup = true)(1L) === 2)
  }

  test("funnel modes: strict_dedup returns the DUPLICATED step's number") {
    // ClickHouse returns events_list[i].second at the interrupt — the
    // duplicated condition's 1-based number, NOT the max level reached:
    // A,B,C then a second B over 4 steps → 2, even though level 3 was hit
    val evs = Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "C"), (1L, 3L, "B"))
    assert(modesLvl(evs, Seq("A", "B", "C", "D"), 100L, dedup = true)(1L)
      === 2)
    // but a COMPLETED funnel early-returns before the duplicate is seen
    val done = Seq((2L, 0L, "A"), (2L, 1L, "B"), (2L, 2L, "B"))
    assert(modesLvl(done, Seq("A", "B"), 100L, dedup = true)(2L) === 2)
    // a repeated step-0 event re-anchors; it is never a dedup duplicate
    val rea = Seq((3L, 0L, "A"), (3L, 1L, "A"), (3L, 2L, "B"))
    assert(modesLvl(rea, Seq("A", "B", "C"), 100L, dedup = true)(3L) === 2)
  }

  test("funnel modes: strict_order interrupts on an unreached predecessor") {
    // CH: a step-i event while step i-1 is unreached returns the first
    // unreached slot — A,C,B over A,B,C → 1 (the later B never lands)
    val evs = Seq((1L, 0L, "A"), (1L, 1L, "C"), (1L, 2L, "B"))
    val steps = Seq("A", "B", "C")
    assert(modesLvl(evs, steps, 100L)(1L) === 2)
    assert(modesLvl(evs, steps, 100L, order = true)(1L) === 1)
    // before any chain start the gap check is inert (first_event gate)
    val pre = Seq((2L, 0L, "C"), (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "C"))
    assert(modesLvl(pre, steps, 100L, order = true)(2L) === 3)
  }

  /** Independent reference: a direct transcription of the ClickHouse
    * getEventLevel loop (AggregateFunctionWindowFunnel.h) over a
    * (t, 1-based cond) event list — one entry per matching condition,
    * sorted by (t, cond); cond-0 entries only exist under strict_order.
    * Shares NOTHING with [[graft.functions.FunnelScan]]. */
  private def chFunnelRef(
      evs: Seq[(Long, Int)], n: Int, window: Long, strictDedup: Boolean,
      strictOrder: Boolean, strictIncrease: Boolean): Int = {
    val slots = Array.fill[Option[(Long, Long)]](n)(None)
    var firstEvent = false
    val it = evs.iterator
    while (it.hasNext) {
      val (t, cond) = it.next()
      val idx = cond - 1
      if (strictOrder && idx == -1) {
        if (firstEvent) return slots.segmentLength(_.isDefined)
      } else if (idx == 0) {
        slots(0) = Some((t, t)); firstEvent = true
      } else if (idx >= 1 && strictDedup && slots(idx).isDefined) {
        return cond
      } else if (idx >= 1 && strictOrder && firstEvent &&
          slots(idx - 1).isEmpty) {
        return slots.indexWhere(_.isEmpty) match {
          case -1 => n
          case k => k
        }
      } else if (idx >= 1 && slots(idx - 1).isDefined) {
        val (f, l) = slots(idx - 1).get
        val ok = t <= f + window && (!strictIncrease || l < t)
        if (ok) {
          slots(idx) = Some((f, t))
          if (idx == n - 1) return n
        }
      }
    }
    slots.segmentLength(_.isDefined)
  }

  test("funnel modes cross-validate the CH reference loop on random streams") {
    val rnd = new scala.util.Random(94)
    val types = Array("A", "B", "C", "D", "x", "y")
    val steps = Seq("A", "B", "C", "D")
    val w = 9L
    val evs = (1L to 120L).flatMap { u =>
      rnd.shuffle((0 until 40).toList).take(6 + rnd.nextInt(25)).map(t =>
        (u, t.toLong, types(rnd.nextInt(types.length))))
    }
    val byUser = evs.groupBy(_._1)
    for (dd <- Seq(false, true); oo <- Seq(false, true);
         ii <- Seq(false, true)) {
      val got = modesLvl(evs, steps, w, dedup = dd, order = oo,
        increase = ii)
      for ((u, rows) <- byUser) {
        val lst = rows.sortBy(_._2).flatMap { case (_, t, ty) =>
          val c = steps.indexOf(ty) + 1
          if (c > 0) Seq((t, c)) else if (oo) Seq((t, 0)) else Nil
        }
        val want = chFunnelRef(lst, steps.size, w, dd, oo, ii)
        assert(got(u) === want, s"user $u dd=$dd oo=$oo ii=$ii")
      }
    }
  }

  test("funnel modes: strict_increase blocks same-timestamp hops") {
    val evs = Seq((1L, 5L, "A"), (1L, 5L, "B"), (1L, 5L, "C"),
      (2L, 0L, "A"), (2L, 1L, "B"), (2L, 2L, "C"))
    val steps = Seq("A", "B", "C")
    assert(modesLvl(evs, steps, 100L)(1L) === 3)
    assert(modesLvl(evs, steps, 100L, increase = true)(1L) === 1)
    assert(modesLvl(evs, steps, 100L, increase = true)(2L) === 3)
  }

  test("funnel modes: window binds against the chain start") {
    val steps = Seq("A", "B", "C")
    // B inside, C outside the window from A
    val evs = Seq((1L, 0L, "A"), (1L, 5L, "B"), (1L, 20L, "C"))
    assert(modesLvl(evs, steps, 10L)(1L) === 2)
    // a later A re-opens the window
    val evs2 = Seq((1L, 0L, "A"), (1L, 12L, "A"), (1L, 15L, "B"),
      (1L, 20L, "C"))
    assert(modesLvl(evs2, steps, 10L)(1L) === 3)
  }

  test("funnel modes (all off) cross-validate funnelLevels on random streams") {
    val rnd = new scala.util.Random(61)
    val types = Array("A", "B", "C", "D", "x")
    val evs = (1L to 40L).flatMap { u =>
      // distinct timestamps per user: the two implementations pin the
      // same semantics only when no peer rows tie
      rnd.shuffle((0 until 30).toList).take(5 + rnd.nextInt(20)).map(t =>
        (u, t.toLong, types(rnd.nextInt(types.length))))
    }
    val steps = Seq("A", "B", "C", "D")
    val w = 12L
    val viaDp = EventAnalytics.funnelLevels(
        evs.toDF("user_id", "__us", "event_type")
          .withColumn("ts", timestamp_micros(col("__us"))),
        "user_id", "ts", "event_type", steps, w)
      .select("user_id", "funnel_level").as[(Long, Int)].collect().toMap
    val viaScan = modesLvl(evs, steps, w, increase = true)
    // funnelLevels' RANGE(-inf,-1] frame is strictly-increasing chains
    assert(viaScan === viaDp)
  }

  // --- timeDecayedAvg -------------------------------------------------

  test("timeDecayedAvg: single event → ema = value; weight of the last") {
    val h = 100L
    val df = Seq((1L, 0L, 10.0), (2L, 0L, 4.0), (2L, h, 8.0))
      .toDF("user_id", "__us", "value")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = EventAnalytics.timeDecayedAvg(df, "user_id", "ts", "value", h)
      .select("user_id", "n_events", "ema")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) === ((1L, 10.0)))
    // user 2: weights 0.5 (one halflife back) and 1 → (2 + 8) / 1.5
    assert(math.abs(got(2L)._2 - (0.5 * 4.0 + 8.0) / 1.5) < 1e-6)
  }

  test("timeDecayedAvg matches the closed form under repartitioning") {
    val rnd = new scala.util.Random(23)
    val h = 1000L
    val events = (1L to 12L).flatMap { u =>
      Seq.fill(1 + rnd.nextInt(30))(
        (u, rnd.nextInt(5000).toLong,
          math.rint(rnd.nextDouble() * 1e4) / 100.0))
    }
    val df = events.toDF("user_id", "__us", "value")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = EventAnalytics
      .timeDecayedAvg(df.repartition(7), "user_id", "ts", "value", h)
      .select("user_id", "ema").as[(Long, Double)].collect().toMap
    for ((u, rows) <- events.groupBy(_._1)) {
      val tMax = rows.map(_._2).max
      val ws = rows.map { case (_, t, v) =>
        val w = math.pow(0.5, (tMax - t).toDouble / h); (w, w * v) }
      val want = ws.map(_._2).sum / ws.map(_._1).sum
      assert(math.abs(got(u) - want) < 1e-5, s"user $u")
    }
  }

  // --- retentionConditions ---------------------------------------------

  test("retentionConditions: anchored AND-flags, summed per slot") {
    val df = Seq(
      // user 1: anchor + c1; user 2: anchor + c1 + c2;
      // user 3: c1/c2 WITHOUT the anchor → contributes nothing;
      // user 4: anchor only
      (1L, "s"), (1L, "a"),
      (2L, "s"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "s"))
      .toDF("user_id", "tag")
    val got = EventAnalytics.retentionConditions(df, "user_id", Seq(
        col("tag") === "s", col("tag") === "a", col("tag") === "b"))
      .select("n_keys", "r_0", "r_1", "r_2")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((4L, 3L, 2L, 1L)))
  }

  // --- sequenceNextNode ----------------------------------------------

  test("sequenceNextNode: first consecutive match wins; end-of-seq → null") {
    val df = Seq(
      // user 1: noise, then signup→view→click — next is click
      (1L, 0L, 1L, "error"), (1L, 1L, 2L, "signup"), (1L, 2L, 3L, "view"),
      (1L, 3L, 4L, "click"), (1L, 4L, 5L, "signup"), (1L, 5L, 6L, "view"),
      (1L, 6L, 7L, "purchase"),
      // user 2: signup→view at the very end — next is NULL
      (2L, 0L, 8L, "signup"), (2L, 1L, 9L, "view"),
      // user 3: signup then click (not view) — no match at all
      (3L, 0L, 10L, "signup"), (3L, 1L, 11L, "click"))
      .toDF("user_id", "__us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = EventAnalytics.sequenceNextNode(df, "user_id", "ts",
        "event_id", "event_type", Seq("signup", "view"))
      .select("user_id", "next_node").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L) === Some("click"))
    assert(got(2L) === None)
    assert(!got.contains(3L))
  }

  test("sequenceNextNode: head / last_match / backward variants") {
    val df = Seq(
      // user 1: signup,view,click,signup,view,purchase — two chains
      (1L, 0L, 1L, "signup"), (1L, 1L, 2L, "view"), (1L, 2L, 3L, "click"),
      (1L, 3L, 4L, "signup"), (1L, 4L, 5L, "view"), (1L, 5L, 6L, "purchase"),
      // user 2: error first → head never matches
      (2L, 0L, 7L, "error"), (2L, 1L, 8L, "signup"), (2L, 2L, 9L, "view"),
      (2L, 3L, 10L, "click"))
      .toDF("user_id", "__us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("__us")))
    def run(direction: String, base: String, steps: Seq[String]) =
      EventAnalytics.sequenceNextNode(df, "user_id", "ts", "event_id",
          "event_type", steps, direction, base)
        .select("user_id", "next_node").as[(Long, Option[String])]
        .collect().toMap
    val fwd = Seq("signup", "view")
    assert(run("forward", "first_match", fwd) ===
      Map(1L -> Some("click"), 2L -> Some("click")))
    assert(run("forward", "last_match", fwd) ===
      Map(1L -> Some("purchase"), 2L -> Some("click")))
    // head: chain must open the sequence
    assert(run("forward", "head", fwd) === Map(1L -> Some("click")))
    // backward with reversed steps: the node right BEFORE a chain;
    // first_match in the descending scan is the LATEST chain
    assert(run("backward", "first_match", Seq("view", "signup")) ===
      Map(1L -> Some("click"), 2L -> Some("error")))
    // backward head: the chain must CLOSE the sequence
    assert(run("backward", "head", Seq("purchase", "view", "signup")) ===
      Map(1L -> Some("click")))
  }

  test("sequenceNextNode: interleaved events break adjacency") {
    val df = Seq(
      (1L, 0L, 1L, "signup"), (1L, 1L, 2L, "error"), (1L, 2L, 3L, "view"))
      .toDF("user_id", "__us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("__us")))
    val got = EventAnalytics.sequenceNextNode(df, "user_id", "ts",
        "event_id", "event_type", Seq("signup", "view"))
      .count()
    assert(got === 0L)
  }
}
