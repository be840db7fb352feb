package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Pass-Join window-code generation as ONE compiled loop (r14): for a
  * string of length `len` under threshold `d`, the DISTINCT packed
  * codes `(i << 48) | (l << 24) | p` over every in-band partner length
  * `La ∈ [len−d, len+d], La > d`, segment index `i ∈ [0, d]`, and the
  * Lemma-3 start interval `p ∈ [max(p_c + max(−i, Δ−(d−i)), 1),
  * min(p_c + min(i, Δ+(d−i)), len−l+1)]` — the exact value set of the
  * nested `transform(filter(sequence…))` lambda it replaces in
  * [[graft.operators.EditDistanceJoin]] (EditDistanceJoinSpec pins
  * element-for-element parity against that SQL expression).
  *
  * Why an expression and not the lambda: the nested higher-order
  * functions allocate ~(2d+1)·(d+1) intermediate arrays per ROW before
  * `flatten`+`array_distinct` (at sf1: 442 K rows × ~150 allocations),
  * which made the window-explode stage GC-hostage — profiled at
  * 2.2–11.3 s for identical code and data depending on heap state
  * (PLANS.md r14 notes). This loop emits into one long[], then one
  * `Arrays.sort` + linear unique pass produces the sorted distinct
  * result (~100–250 codes per string at d=8), allocating exactly one
  * result array per row. Sort-at-end rather than sorted-insert (r14
  * ADVICE): maxDist is a caller parameter, and the backward-scan
  * insert is O(n²) worst-case — a larger d grows the code count as
  * (2d+1)(d+1)², turning each insert's scan into a per-row CPU cliff;
  * the single sort keeps the bound O(n log n) regardless of arrival
  * order, same allocation profile. */
case class WindowCodes(child: Expression, d: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with UnaryEvalCodegen {
  require(d >= 1, s"maxDist must be >= 1, got $d")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WindowCodes needs an INT length column, got ${child.dataType}")
  }
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  override def nullSafeEval(a: Any): Any =
    WindowCodes.codes(a.asInstanceOf[Int], d)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[WindowCodes]] restricted to partner lengths that actually OCCUR in
  * the corpus (r16 judge directive #5, the q75 carrier cut): window
  * codes exist to match the segment side's (hash, i, l) keys, and a
  * segment row's l/p derive from its string's ACTUAL length La — so
  * codes emitted for an La no string has can never complete a true
  * pair; they are pure probe noise (and on a constant-length corpus
  * they are (2d+1)× the useful rows: q75's fixed 80-char heads emit
  * 100 distinct codes per string under the full band vs 41 under the
  * single present length). `lengths` is the sorted distinct-length
  * set, one broadcast per operator invocation (the
  * [[RarestPrefix.broadcastTable]] shipping discipline). Restricting
  * to present lengths is LOSSLESS: a true pair (a, b) matches through
  * La = len(a), which is present by construction — pinned by
  * EditDistanceJoinSpec's brute-force parity suites (their corpora
  * have sparse length sets) and the dedicated parity test. */
case class WindowCodesPresent(child: Expression, d: Int,
    lengths: org.apache.spark.broadcast.Broadcast[Array[Int]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with UnaryEvalCodegen {
  require(d >= 1, s"maxDist must be >= 1, got $d")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WindowCodesPresent needs an INT length column, got ${child.dataType}")
  }
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  override def nullSafeEval(a: Any): Any =
    WindowCodes.codesForLengths(a.asInstanceOf[Int], d, lengths.value)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowCodes {
  /** Full-band codes: every `La ∈ [len−d, len+d], La > d`. */
  def codes(len: Int, d: Int): ArrayData = codesImpl(len, d, null)

  /** Codes for the partner lengths in sorted `present` only (∩ the
    * band); `present` must be strictly ascending. */
  def codesForLengths(len: Int, d: Int, present: Array[Int]): ArrayData =
    codesImpl(len, d, present)

  private def codesImpl(len: Int, d: Int, present: Array[Int]): ArrayData = {
    val parts = d + 1
    // upper bound: (2d+1) lengths x (d+1) indices x interval width <= d+1
    val buf = new Array[Long](((2 * d + 1) * parts * parts))
    var n = 0
    val laMin = math.max(len - d, d + 1)
    val laMax = len + d
    // iteration domain: the full band, or its intersection with the
    // present-length set (binary search for the first in-band entry,
    // then walk the sorted array)
    var pi =
      if (present == null) -1
      else {
        val idx = java.util.Arrays.binarySearch(present, laMin)
        if (idx >= 0) idx else -(idx + 1)
      }
    var la = if (present == null) laMin
      else if (pi < present.length) present(pi) else laMax + 1
    while (la <= laMax) {
      val kA = la / parts
      val rA = la % parts
      val delta = len - la
      var i = 0
      while (i <= d) {
        val pc = i * kA + math.min(i, rA) + 1
        val l = kA + (if (i < rA) 1 else 0)
        val lo = math.max(pc + math.max(-i, delta - (d - i)), 1)
        val hi = math.min(pc + math.min(i, delta + (d - i)), len - l + 1)
        var p = lo
        while (p <= hi) {
          buf(n) = i.toLong << 48 | l.toLong << 24 | p.toLong
          n += 1
          p += 1
        }
        i += 1
      }
      if (present == null) la += 1
      else {
        pi += 1
        la = if (pi < present.length) present(pi) else laMax + 1
      }
    }
    // sorted distinct in one pass: sort, then in-place linear unique
    java.util.Arrays.sort(buf, 0, n)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || buf(w - 1) != buf(r)) { buf(w) = buf(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, w))
  }
}
