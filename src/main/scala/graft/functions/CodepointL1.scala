package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Lower bound on 2×Levenshtein from bucketed codepoint frequencies —
  * Pass-Join's content-based filter (Li/Deng/Feng PVLDB 5(3) §4.3
  * "content filter"): each edit operation (insert / delete /
  * substitute) changes at most TWO codepoint occurrences, so the L1
  * distance between codepoint-frequency vectors is ≤ 2·ed(a, b); any
  * candidate pair with L1 > 2·maxDist can be discarded WITHOUT running
  * the O(d·L) banded DP, and no true pair is ever dropped.
  *
  * Buckets: codepoints are counted by their LEADING UTF-8 byte (a
  * deterministic many-to-one bucketing; merging buckets only shrinks
  * L1 by the triangle inequality, so the bound stays valid) — ASCII
  * codepoints get exact per-character buckets, multi-byte codepoints
  * coarsen by lead byte. Counting walks the UTF8String bytes in place
  * (continuation bytes `10xxxxxx` skipped), no String materialization
  * — O(bytes) with one 256-int scratch array per pair, orders of
  * magnitude under the banded-Levenshtein DP it guards. */
case class CodepointL1(left: Expression, right: Expression)
    extends BinaryExpression with BinaryEvalCodegen {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override protected def castResult(x: String): String =
    s"((java.lang.Integer) $x).intValue()"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(CodepointL1.l1(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CodepointL1 {

  /** L1 distance between the lead-byte-bucketed codepoint frequency
    * vectors of `a` and `b`. Guaranteed ≤ 2·levenshtein(a, b). */
  def l1(a: UTF8String, b: UTF8String): Int = {
    val counts = new Array[Int](256)
    val na = a.numBytes
    var i = 0
    while (i < na) {
      val v = a.getByte(i) & 0xff
      if ((v & 0xc0) != 0x80) counts(v) += 1 // leading bytes only
      i += 1
    }
    val nb = b.numBytes
    i = 0
    while (i < nb) {
      val v = b.getByte(i) & 0xff
      if ((v & 0xc0) != 0x80) counts(v) -= 1
      i += 1
    }
    var l1 = 0
    i = 0
    while (i < 256) {
      l1 += math.abs(counts(i))
      i += 1
    }
    l1
  }
}
