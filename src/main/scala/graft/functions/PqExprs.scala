package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels ([[graft.operators.Pq]]): both are pure
  * per-row maps over the embedding column with the (small) codebooks
  * embedded as plan constants — the corpus is never shuffled to encode,
  * and a 100 TB encode is one scan writing M bytes per vector.
  *
  * Both normalize the input to unit L2 first, so squared L2 distance is
  * `2 − 2·cos` and ADC ranking by ascending distance matches the cosine
  * family ([[CosineSimilarity]]) the rest of the ANN operators use.
  */
private[graft] object PqMath {
  /** Unit-normalized copy of an ArrayData double vector; null for a
    * zero-norm or empty vector (no defined cosine → no defined code). */
  def normalized(x: ArrayData): Array[Double] = {
    val n = x.numElements()
    if (n == 0) return null
    val v = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val xi = x.getDouble(i); v(i) = xi; s += xi * xi; i += 1 }
    if (s == 0.0) return null
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < n) { v(i) *= inv; i += 1 }
    v
  }

  /** Squared L2 between `v[off, off+cent.length)` and `cent` — the ONE
    * distance kernel shared by encode, query-table scoring, and k-means
    * assignment, so the three can never drift apart. */
  def sliceDist(v: Array[Double], off: Int, cent: Array[Double]): Double = {
    var d = 0.0
    var j = 0
    while (j < cent.length) {
      val diff = v(off + j) - cent(j); d += diff * diff; j += 1
    }
    d
  }

  /** Lowest-distance codeword index (ties to the lowest code). */
  def nearestCode(
      v: Array[Double], off: Int, cb: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val d = sliceDist(v, off, cb(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** Per-subspace nearest-codeword id of the unit-normalized vector:
  * `codebooks(s)` holds `ksub` centroids of the s-th `dsub`-wide slice.
  * Ties break to the lowest code. Null for zero-norm vectors or a
  * dimensionality that doesn't match `m · dsub`. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cents: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val dsub: Int = cents(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = PqMath.normalized(input.asInstanceOf[ArrayData])
    val m = cents.length
    if (v == null || v.length != m * dsub) return null
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      out(s) = PqMath.nearestCode(v, s * dsub, cents(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance lookup tables for a query vector: element
  * `[s][c]` is the squared L2 distance from the query's s-th
  * unit-normalized slice to codeword c — computed once per QUERY row
  * (M·ksub·dsub flops), after which every corpus candidate scores in
  * M table lookups. Null under the same conditions as [[PqEncode]]. */
case class PqQueryTables(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cents: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val dsub: Int = cents(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = PqMath.normalized(input.asInstanceOf[ArrayData])
    val m = cents.length
    if (v == null || v.length != m * dsub) return null
    val tables = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cb = cents(s)
      val off = s * dsub
      val row = new Array[Any](cb.length)
      var c = 0
      while (c < cb.length) {
        row(c) = PqMath.sliceDist(v, off, cb(c))
        c += 1
      }
      tables(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(tables)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
