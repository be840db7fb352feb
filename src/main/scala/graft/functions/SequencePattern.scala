package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** ClickHouse `sequenceMatch` / `sequenceCount` pattern engine — the
  * event-chain twin of `windowFunnel` (q55): does a user's event stream
  * contain a chain matching a pattern like `(?1)(?t<=900)(?2).*(?3)`,
  * and how many non-overlapping such chains exist.
  *
  * Pattern grammar (ClickHouse's, docs "sequenceMatch"):
  *  - `(?N)`      — an event satisfying condition N (1-based).
  *  - `.*`        — any number of any considered events in between.
  *  - `(?t OP v)` — time constraint between the two ADJACENT matched
  *    events, `OP ∈ {<, <=, >, >=, ==}`, `v` in SECONDS (DateTime
  *    parity); an arbitrary number of events may lie between (the
  *    constraint implies `.*`, per the ClickHouse docs' wording).
  *  - Two directly concatenated `(?N)(?M)` require ADJACENT positions
  *    in the considered sequence.
  * Considered events = rows where at least one condition holds (rows
  * matching no condition are never collected — ClickHouse parity), in
  * ascending time order. Same-timestamp events order by their condition
  * bitmask (ClickHouse leaves same-second order undefined; this makes
  * it deterministic instead).
  *
  * Matching is an O(k·n·log n) reachability DP, not backtracking: for
  * each pattern step the sorted list of positions where a valid prefix
  * can end is computed from the previous step's list — DIRECT needs
  * position p−1 reachable, `.*` needs any earlier position, and a time
  * constraint needs an earlier reachable position whose time satisfies
  * OP (binary search over the reachable positions' times, which are
  * ascending). `sequenceCount` counts non-overlapping chains greedily
  * by earliest chain END (restarting strictly after it) — the greedy
  * that provably maximizes the number of disjoint chains (classic
  * earliest-deadline exchange argument) and coincides with ClickHouse's
  * scan-from-the-left count.
  */
object SequencePattern {

  sealed trait Sep
  case object Direct extends Sep
  case object AnyGap extends Sep
  /** opCode: 0 '<', 1 '<=', 2 '>', 3 '>=', 4 '=='; v in micros. */
  final case class TimeGap(opCode: Int, vUs: Long) extends Sep

  /** conds(i) = 1-based condition index of pattern step i;
    * seps(i) = separator between step i and step i+1. */
  final case class Compiled(conds: Array[Int], seps: Array[Sep]) {
    require(conds.length >= 1 && seps.length == conds.length - 1)
  }

  private val StepRe = """^\(\?(\d+)\)""".r
  private val TimeRe = """^\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\)""".r

  /** Parse a pattern. `unitUs` scales the time-constraint values to
    * micros (1e6 for second-granularity constraints — the default and
    * the ClickHouse DateTime behavior). */
  def compile(pattern: String, unitUs: Long = 1000000L): Compiled = {
    var rest = pattern.trim
    val conds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val seps = scala.collection.mutable.ArrayBuffer.empty[Sep]
    var pendingSep: Option[Sep] = None
    def fail(msg: String) =
      throw new IllegalArgumentException(s"bad sequence pattern '$pattern': $msg")
    while (rest.nonEmpty) {
      TimeRe.findFirstMatchIn(rest) match {
        case Some(m) =>
          if (conds.isEmpty) fail("pattern cannot start with a time constraint")
          if (pendingSep.exists(_ != Direct)) fail("two separators in a row")
          val op = m.group(1) match {
            case "<" => 0; case "<=" => 1; case ">" => 2; case ">=" => 3
            case "==" => 4
          }
          pendingSep = Some(TimeGap(op, m.group(2).toLong * unitUs))
          rest = rest.substring(m.matched.length)
        case None => StepRe.findFirstMatchIn(rest) match {
          case Some(m) =>
            val n = m.group(1).toInt
            if (n < 1 || n > 62) fail(s"condition index $n out of range 1..62")
            if (conds.nonEmpty) seps += pendingSep.getOrElse(Direct)
            pendingSep = None
            conds += n
            rest = rest.substring(m.matched.length)
          case None if rest.startsWith(".*") =>
            if (conds.isEmpty) fail("pattern cannot start with .*")
            if (pendingSep.exists(_ != Direct)) fail("two separators in a row")
            pendingSep = Some(AnyGap)
            rest = rest.substring(2)
          case None => fail(s"unrecognized at '...${rest.take(12)}'")
        }
      }
    }
    if (pendingSep.exists(_ != Direct)) fail("pattern cannot end with a separator")
    if (conds.isEmpty) fail("no (?N) steps")
    Compiled(conds.toArray, seps.toArray)
  }

  /** Positions (ascending) where a full-pattern chain STARTING at a
    * position > `fromExclusive` can END; returns the smallest such end
    * position, or -1. `ts`/`masks` are the considered events in time
    * order. */
  private def earliestEnd(
      ts: Array[Long], masks: Array[Long], c: Compiled,
      fromExclusive: Int): Int = {
    val n = ts.length
    // reach = ascending positions where the prefix ending at step s ends
    var reach = new Array[Int](0)
    var s = 0
    while (s < c.conds.length) {
      val bit = 1L << (c.conds(s) - 1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      if (s == 0) {
        var p = fromExclusive + 1
        while (p < n) { if ((masks(p) & bit) != 0L) out += p; p += 1 }
      } else c.seps(s - 1) match {
        case Direct =>
          // previous step's reach is ascending; membership via pointer
          var ri = 0
          var p = 0
          while (ri < reach.length) {
            p = reach(ri) + 1
            if (p < n && (masks(p) & bit) != 0L) out += p
            ri += 1
          }
        case AnyGap =>
          if (reach.nonEmpty) {
            var p = reach(0) + 1
            while (p < n) { if ((masks(p) & bit) != 0L) out += p; p += 1 }
          }
        case TimeGap(op, v) =>
          // for each candidate p, need a reachable q < p with
          // (ts(p) - ts(q)) OP v. reach times are ascending, so the
          // feasibility check is a binary search:
          //  <, <=  : easiest witness is the LATEST reachable q < p
          //  >, >=  : easiest witness is the EARLIEST reachable q < p
          //  ==     : exact-value search among reachable times
          if (reach.nonEmpty) {
            val rts = reach.map(ts(_)) // ascending (ties preserved)
            var p = reach(0) + 1
            while (p < n) {
              if ((masks(p) & bit) != 0L) {
                // count of reachable positions strictly before p
                val k = upperBoundPos(reach, p)
                if (k > 0) {
                  val ok = op match {
                    case 0 => ts(p) - rts(k - 1) < v
                    case 1 => ts(p) - rts(k - 1) <= v
                    case 2 => ts(p) - rts(0) > v
                    case 3 => ts(p) - rts(0) >= v
                    case 4 => containsValue(rts, k, ts(p) - v)
                  }
                  if (ok) out += p
                }
              }
              p += 1
            }
          }
      }
      if (out.isEmpty) return -1
      reach = out.toArray
      s += 1
    }
    reach(0)
  }

  /** index of first element in ascending `a` that is >= limit — i.e.
    * the count of elements strictly below `limit`. */
  private def upperBoundPos(a: Array[Int], limit: Int): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < limit) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def containsValue(a: Array[Long], len: Int, v: Long): Boolean = {
    var lo = 0; var hi = len
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < v) lo = mid + 1 else hi = mid
    }
    lo < len && a(lo) == v
  }

  def matches(ts: Array[Long], masks: Array[Long], c: Compiled): Boolean =
    earliestEnd(ts, masks, c, -1) >= 0

  def countNonOverlapping(ts: Array[Long], masks: Array[Long], c: Compiled): Long = {
    var cnt = 0L
    var from = -1
    var e = earliestEnd(ts, masks, c, from)
    while (e >= 0) {
      cnt += 1
      from = e
      e = earliestEnd(ts, masks, c, from)
    }
    cnt
  }
}

/** Shared eval for the two sequence expressions: child is the per-user
  * `array<struct<t: long, mask: long>>` SORTED ascending (sort_array on
  * the struct sorts by t, then mask — deterministic tie order). The
  * pattern compiles once per executor instance (the case-class field is
  * the string; `lazy val` caches the compiled form). */
abstract class SequenceExprBase extends UnaryExpression with CodegenFallback {
  def pattern: String
  protected lazy val compiled: SequencePattern.Compiled =
    SequencePattern.compile(pattern)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StructType(Array(a, b)), _)
          if a.dataType == LongType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<struct<long,long>>, got ${other.catalogString}")
    }
  }

  protected def unpack(input: Any): (Array[Long], Array[Long]) = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val ts = new Array[Long](n)
    val masks = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ts(i) = row.getLong(0)
      masks(i) = row.getLong(1)
      i += 1
    }
    (ts, masks)
  }
}

/** `sequenceMatch(pattern)` over a sorted per-user event array. */
case class SequenceMatchExpr(child: Expression, pattern: String)
    extends SequenceExprBase {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any = {
    val (ts, masks) = unpack(input)
    java.lang.Boolean.valueOf(SequencePattern.matches(ts, masks, compiled))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sequenceCount(pattern)` — non-overlapping chains, earliest-end
  * greedy. */
case class SequenceCountExpr(child: Expression, pattern: String)
    extends SequenceExprBase {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val (ts, masks) = unpack(input)
    java.lang.Long.valueOf(
      SequencePattern.countNonOverlapping(ts, masks, compiled))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ClickHouse `windowFunnel(window, [modes])(t, c1..cn)` over a sorted
  * per-user (t, mask) array — the mode-bearing sibling of
  * [[graft.operators.EventAnalytics.funnelLevels]]'s window DP (the
  * two implementations cross-validate each other in
  * EventAnalyticsSpec). Mask bit i = event matches step i; mask 0 rows
  * are "other" events (present only when the caller collects them for
  * `strict_order`).
  *
  * Recurrence (ClickHouse's AggregateFunctionWindowFunnel chain
  * update, over events ascending by (t, mask) — single-bit masks make
  * that ClickHouse's (t, step-index) order):
  *  - step 0 match: record (t, t) as the CURRENT chain start
  *    (later starts replace earlier — the latest feasible start is the
  *    most permissive for the window bound);
  *  - step i>0 match: if step i−1 is reached with chain start `first`
  *    and last-hop time `last`, extend when `t ≤ first + window` and
  *    (`strict_increase` off or `last < t`);
  *  - `strict_dedup`: a step whose slot is ALREADY reached interrupts
  *    processing and the result is that step's 1-based number (NOT the
  *    max level reached — A,B,C then a second B over 4 steps yields 2,
  *    mirroring ClickHouse's `return events_list[i].second`);
  *  - `strict_order`: after the first step-0 match, BOTH a mask-0
  *    event AND a step event whose predecessor slot is unreached
  *    interrupt (A,C,B over steps A,B,C yields 1 — the C interrupts
  *    because slot B is unreached, so the later B never lands);
  *    mask-0 events before any chain start are ignored;
  *  - completing the LAST step finalizes the level immediately (the
  *    ClickHouse early `return events_timestamp.size()`), so a later
  *    `strict_dedup` duplicate cannot lower a completed funnel.
  * An event matching several (duplicated) step types processes its set
  * bits ascending, so it can serve consecutive steps at one timestamp
  * unless `strict_increase` forbids it. The else-if chain below is
  * check-for-check the one in ClickHouse
  * AggregateFunctionWindowFunnel.h::getEventLevel (notably: a repeated
  * step-0 event re-anchors and is never a `strict_dedup` duplicate,
  * because the step-0 branch precedes the dedup check).
  */
case class WindowFunnelExpr(
    child: Expression, windowUs: Long, nSteps: Int,
    strictDedup: Boolean, strictOrder: Boolean, strictIncrease: Boolean)
    extends SequenceExprBase {
  require(nSteps >= 1 && nSteps <= 62, s"1..62 steps, got $nSteps")
  // pattern is unused by this expression; the base class wants one
  override def pattern: String = ""
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val (ts, masks) = unpack(input)
    val st = FunnelScan.State.fresh(nSteps)
    FunnelScan.advance(st, ts, masks, windowUs,
      strictDedup, strictOrder, strictIncrease)
    java.lang.Integer.valueOf(FunnelScan.level(st))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The windowFunnel chain-update recurrence shared between the batch
  * expression ([[WindowFunnelExpr]], fresh state per array) and the
  * streaming operator ([[graft.streaming.StreamingFunnel]], state
  * persisted per key across micro-batches). Mutating `advance` keeps
  * the batch hot path allocation-free; streaming copies in/out of its
  * encoder-friendly state row. */
object FunnelScan {

  /** `forced` is the level pinned by an interrupting event (−1 = none):
    * the duplicated step's 1-based number under `strict_dedup`, the
    * contiguous level under a `strict_order` predecessor-gap interrupt,
    * or `nSteps` on last-step completion. Once set it overrides the
    * slot scan in [[level]]. */
  final class State(
      val first: Array[Long], val last: Array[Long],
      val set: Array[Boolean], var firstEvent: Boolean,
      var interrupted: Boolean, var forced: Int)

  object State {
    def fresh(nSteps: Int): State = new State(
      new Array[Long](nSteps), new Array[Long](nSteps),
      new Array[Boolean](nSteps), firstEvent = false, interrupted = false,
      forced = -1)
  }

  /** Fold the (t, mask) events — ascending (t, mask) — into `st`. */
  def advance(
      st: State, ts: Array[Long], masks: Array[Long], windowUs: Long,
      strictDedup: Boolean, strictOrder: Boolean,
      strictIncrease: Boolean): Unit = {
    val nSteps = st.set.length
    var i = 0
    while (i < ts.length && !st.interrupted) {
      val t = ts(i)
      val m = masks(i)
      if (m == 0L) {
        if (strictOrder && st.firstEvent) st.interrupted = true
      } else {
        var idx = 0
        while (idx < nSteps && !st.interrupted) {
          if ((m & (1L << idx)) != 0L) {
            if (idx == 0) {
              st.first(0) = t; st.last(0) = t; st.set(0) = true
              st.firstEvent = true
            } else if (strictDedup && st.set(idx)) {
              // CH returns the duplicated condition's 1-based number
              st.interrupted = true
              st.forced = idx + 1
            } else if (strictOrder && st.firstEvent && !st.set(idx - 1)) {
              // CH returns the first unreached slot (the contiguous
              // level so far) when a step skips its predecessor
              st.interrupted = true
              var lvl = 0
              while (lvl < nSteps && st.set(lvl)) lvl += 1
              st.forced = lvl
            } else if (st.set(idx - 1) && t <= st.first(idx - 1) + windowUs &&
                (!strictIncrease || st.last(idx - 1) < t)) {
              st.first(idx) = st.first(idx - 1)
              st.last(idx) = t
              st.set(idx) = true
              if (idx == nSteps - 1) {
                // CH early-returns size on last-step completion; pin it
                // so a later strict_dedup duplicate cannot lower it
                st.interrupted = true
                st.forced = nSteps
              }
            }
          }
          idx += 1
        }
      }
      i += 1
    }
  }

  def level(st: State): Int = {
    if (st.forced >= 0) return st.forced
    var lvl = st.set.length - 1
    while (lvl >= 0 && !st.set(lvl)) lvl -= 1
    lvl + 1
  }
}
