package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", arXiv:1902.04023; the structure behind
  * ClickHouse `quantileTDigest`, AggregateFunctions/QuantileTDigest.h).
  *
  * Centroids are kept sorted by mean; an incoming-value buffer amortizes
  * sorting, and a greedy pass re-clusters under the k1 scale function
  * k(q) = δ/2π · asin(2q−1), which caps centroid count at ~δ and shrinks
  * centroid width toward the tails — rank error is O(q(1−q)/δ), tightest
  * exactly where p99/p999 live. This is the piece Spark's built-in
  * `percentile_approx` (Greenwald-Khanna summaries) does not give:
  * CONSTANT-size partials with tail-proportional accuracy, fully
  * mergeable (merge = concat + one re-cluster pass), so grouped
  * quantiles at 100 TB shuffle ≤ ~δ (mean, weight) pairs per
  * (group × partition) regardless of data volume.
  *
  * Interpolation: centroid i is anchored at cumulative weight
  * C_i = Σ_{j<i} w_j + w_i/2 (the paper's mid-point rule); quantile(p)
  * linearly interpolates between anchor means, with the global min/max
  * closing the tail segments so p→0/1 converge to the true extremes.
  */
final class TDigestBuf(val compression: Double) {
  private val twoPi = 2.0 * math.Pi

  // merged centroids, sorted by mean
  private[functions] var means = new Array[Double](0)
  private[functions] var weights = new Array[Double](0)
  private var nMerged = 0
  private var totalW = 0.0

  // unmerged incoming buffer
  private val bufCap = 512
  private var bufV = new Array[Double](bufCap)
  private var bufN = 0

  var vMin: Double = Double.PositiveInfinity
  var vMax: Double = Double.NegativeInfinity

  def isEmpty: Boolean = nMerged == 0 && bufN == 0
  def total: Double = { flush(); totalW }
  def centroidCount: Int = { flush(); nMerged }

  def add(x: Double): Unit = {
    if (bufN == bufCap) flush()
    bufV(bufN) = x
    bufN += 1
    if (x < vMin) vMin = x
    if (x > vMax) vMax = x
  }

  def mergeWith(other: TDigestBuf): Unit = {
    other.flush()
    flush()
    if (other.nMerged > 0) {
      val m = new Array[Double](nMerged + other.nMerged)
      val w = new Array[Double](nMerged + other.nMerged)
      // merge two mean-sorted runs
      var i = 0; var j = 0; var k = 0
      while (i < nMerged && j < other.nMerged) {
        if (means(i) <= other.means(j)) { m(k) = means(i); w(k) = weights(i); i += 1 }
        else { m(k) = other.means(j); w(k) = other.weights(j); j += 1 }
        k += 1
      }
      while (i < nMerged) { m(k) = means(i); w(k) = weights(i); i += 1; k += 1 }
      while (j < other.nMerged) { m(k) = other.means(j); w(k) = other.weights(j); j += 1; k += 1 }
      means = m; weights = w; nMerged = k; totalW += other.totalW
      recluster()
    }
    if (other.vMin < vMin) vMin = other.vMin
    if (other.vMax > vMax) vMax = other.vMax
  }

  private def k(q: Double): Double =
    compression / twoPi * math.asin(math.max(-1.0, math.min(1.0, 2.0 * q - 1.0)))

  private def kInv(kk: Double): Double = {
    val c = compression / twoPi
    if (kk >= compression / 4.0) 1.0
    else if (kk <= -compression / 4.0) 0.0
    else (math.sin(kk / c) + 1.0) / 2.0
  }

  /** Fold the incoming buffer into the centroid set. */
  private def flush(): Unit = if (bufN > 0) {
    val sorted = java.util.Arrays.copyOf(bufV, bufN)
    java.util.Arrays.sort(sorted)
    val m = new Array[Double](nMerged + bufN)
    val w = new Array[Double](nMerged + bufN)
    var i = 0; var j = 0; var kk = 0
    while (i < nMerged && j < bufN) {
      if (means(i) <= sorted(j)) { m(kk) = means(i); w(kk) = weights(i); i += 1 }
      else { m(kk) = sorted(j); w(kk) = 1.0; j += 1 }
      kk += 1
    }
    while (i < nMerged) { m(kk) = means(i); w(kk) = weights(i); i += 1; kk += 1 }
    while (j < bufN) { m(kk) = sorted(j); w(kk) = 1.0; j += 1; kk += 1 }
    means = m; weights = w; nMerged = kk; totalW += bufN
    bufN = 0
    recluster()
  }

  /** One greedy left-to-right pass under the k1 size bound. */
  private def recluster(): Unit = if (nMerged > 1) {
    var out = 0 // index of current absorbing centroid
    var cw = 0.0 // weight strictly left of the absorbing centroid
    var qLimit = kInv(k(0.0) + 1.0)
    var i = 1
    while (i < nMerged) {
      val q = (cw + weights(out) + weights(i)) / totalW
      if (q <= qLimit) {
        val wsum = weights(out) + weights(i)
        means(out) = (means(out) * weights(out) + means(i) * weights(i)) / wsum
        weights(out) = wsum
      } else {
        cw += weights(out)
        qLimit = kInv(k(cw / totalW) + 1.0)
        out += 1
        means(out) = means(i)
        weights(out) = weights(i)
      }
      i += 1
    }
    nMerged = out + 1
  }

  /** Quantile by mid-point interpolation; NaN on empty input. */
  def quantile(p: Double): Double = {
    flush()
    if (nMerged == 0) return Double.NaN
    if (nMerged == 1) return means(0)
    val target = p * totalW
    // left tail: below the first centroid's anchor
    if (target <= weights(0) / 2.0)
      return vMin + (target / (weights(0) / 2.0)) * (means(0) - vMin)
    // right tail
    val lastHalf = weights(nMerged - 1) / 2.0
    if (target >= totalW - lastHalf) {
      val over = target - (totalW - lastHalf)
      return means(nMerged - 1) +
        (over / lastHalf) * (vMax - means(nMerged - 1))
    }
    var cum = weights(0) / 2.0 // anchor of centroid 0
    var i = 0
    while (i < nMerged - 1) {
      val gap = (weights(i) + weights(i + 1)) / 2.0
      if (target <= cum + gap) {
        val f = (target - cum) / gap
        return means(i) + f * (means(i + 1) - means(i))
      }
      cum += gap
      i += 1
    }
    vMax // unreachable given the tail check; defensive
  }

  private[functions] def restore(
      m: Array[Double], w: Array[Double], n: Int, total: Double): Unit = {
    means = m
    weights = w
    nMerged = n
    totalW = total
  }

  def serialize(): Array[Byte] = {
    flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(compression)
    out.writeDouble(vMin)
    out.writeDouble(vMax)
    out.writeDouble(totalW)
    out.writeInt(nMerged)
    var i = 0
    while (i < nMerged) {
      out.writeDouble(means(i))
      out.writeDouble(weights(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object TDigestBuf {
  def deserialize(bytes: Array[Byte]): TDigestBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TDigestBuf(in.readDouble())
    buf.vMin = in.readDouble()
    buf.vMax = in.readDouble()
    val total = in.readDouble()
    val n = in.readInt()
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    var i = 0
    while (i < n) { m(i) = in.readDouble(); w(i) = in.readDouble(); i += 1 }
    buf.restore(m, w, n, total)
    buf
  }
}

/** ClickHouse `quantilesTDigest(p…)(x)`: one t-digest per group, one
  * ARRAY<DOUBLE> of quantiles out. Null inputs are skipped (ClickHouse
  * quantile-family convention); an all-null group yields NaNs. */
case class TDigestQuantiles(
    child: Expression, percentiles: Seq[Double], compression: Double = 200.0,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestBuf] {
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1))
  require(compression >= 20, "compression below 20 gives no useful digest")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"input must be DOUBLE, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)

  override def update(buf: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TDigestBuf, other: TDigestBuf): TDigestBuf = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: TDigestBuf): Any =
    new GenericArrayData(percentiles.map(buf.quantile).toArray)

  override def serialize(buf: TDigestBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestBuf =
    TDigestBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantiles =
    copy(child = newChildren(0))
}

object TDigest {
  import ColumnBridge._

  /** `quantilesTDigest(ps…)(c)` → ARRAY<DOUBLE> in `ps` order. */
  def quantiles(c: Column, ps: Seq[Double], compression: Double = 200.0): Column =
    col(TDigestQuantiles(expr(c), ps, compression).toAggregateExpression())
}
