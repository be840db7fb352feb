package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 8-bucket saturating codepoint histogram packed into ONE long — the
  * join-time miniature of [[CodepointL1]], for Pass-Join's content
  * filter applied BEFORE the candidate `distinct` and the two string
  * joins instead of after them (r14). The full 256-bucket filter needs
  * the strings, so it can only run once candidates have re-joined the
  * (id, string) base; this 8-byte digest rides the segment/window
  * shuffle rows (one long next to the 8-byte segment hash), so the
  * bound prunes a candidate at the (hash, index, length) join itself —
  * before the pair row is distinct-shuffled or either string moves.
  *
  * Soundness chain (each step can only SHRINK the L1, so the
  * `packedL1 > 2·maxDist ⟹ reject` test never drops a true pair):
  *  1. full codepoint-frequency L1 ≤ 2·levenshtein ([[CodepointL1]]'s
  *     lemma — one edit touches at most two codepoint occurrences);
  *  2. merging codepoint classes into 8 buckets (leading UTF-8 byte,
  *     low 3 bits) shrinks L1 by the triangle inequality;
  *  3. saturating each bucket count at 255 shrinks every per-bucket
  *     difference: |min(a,255) − min(b,255)| ≤ |a − b|.
  * The 256-bucket [[CodepointL1]] stays as the tighter post-join
  * filter; this digest only thins what reaches it. */
case class PackedHist(child: Expression)
    extends UnaryExpression with UnaryEvalCodegen {
  override def dataType: DataType = LongType
  override protected def castResult(x: String): String =
    s"((java.lang.Long) $x).longValue()"

  override def nullSafeEval(a: Any): Any =
    java.lang.Long.valueOf(PackedHist.pack(a.asInstanceOf[UTF8String]))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackedHist {
  /** Bucket = low 3 bits of each leading UTF-8 byte; counts saturate
    * at 255 and pack little-endian into one long (bucket i at bits
    * 8i..8i+7). */
  def pack(s: UTF8String): Long = {
    val counts = new Array[Int](8)
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val v = s.getByte(i) & 0xff
      if ((v & 0xc0) != 0x80) { // leading bytes only, like CodepointL1
        val b = v & 7
        if (counts(b) < 255) counts(b) += 1
      }
      i += 1
    }
    var packed = 0L
    i = 0
    while (i < 8) { packed |= counts(i).toLong << (8 * i); i += 1 }
    packed
  }
}

/** L1 distance between two [[PackedHist]] digests: Σ over the 8
  * unsigned byte lanes of |a_i − b_i|. By the soundness chain above,
  * `PackedHistL1(pa, pb) ≤ 2·levenshtein(a, b)`. */
case class PackedHistL1(left: Expression, right: Expression)
    extends BinaryExpression with BinaryEvalCodegen {
  override def dataType: DataType = IntegerType
  override protected def castResult(x: String): String =
    s"((java.lang.Integer) $x).intValue()"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(PackedHistL1.l1(
      a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PackedHistL1 {
  def l1(a: Long, b: Long): Int = {
    var l1 = 0
    var i = 0
    while (i < 8) {
      l1 += math.abs(((a >>> (8 * i)) & 0xff).toInt -
        ((b >>> (8 * i)) & 0xff).toInt)
      i += 1
    }
    l1
  }
}
