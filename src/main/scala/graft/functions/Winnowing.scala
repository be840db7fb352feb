package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm): Rabin-Karp rolling hash over character
  * `k`-grams, then keep the minimum hash of every `window` consecutive
  * k-grams (rightmost on ties), recording each selected position once.
  * Guarantees: any substring match of length ≥ window+k-1 shares at
  * least one fingerprint, and fingerprints are position-independent —
  * unlike fixed-offset chunking, inserting a word early in a document
  * does not shift every later fingerprint.
  *
  * One native pass per row, O(len) time, O(window) extra space; output
  * is the distinct selected hashes (first-occurrence order). Null input
  * → null (standard null propagation); shorter than `k` chars → empty
  * array.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression with UnaryEvalCodegen {
  require(k >= 2 && window >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  private val B = 1000003L // rolling base (wrap-around Long arithmetic)
  @transient private lazy val bPowK1 = {
    var p = 1L; var i = 0
    while (i < k - 1) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val m = n - k + 1
    // rolling k-gram hashes
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * bPowK1) * B + s.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    // winnow: min of each window of `window` hashes, rightmost on ties
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new scala.collection.mutable.HashSet[Long]()
    var lastPick = -1
    var w0 = 0
    val lastW0 = m - math.min(window, m)
    while (w0 <= lastW0) {
      val end = math.min(m, w0 + window)
      var best = w0
      var j = w0 + 1
      while (j < end) {
        if (hs(j) <= hs(best)) best = j // rightmost minimal
        j += 1
      }
      if (best != lastPick) {
        lastPick = best
        if (seen.add(hs(best))) out += hs(best)
      }
      w0 += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
