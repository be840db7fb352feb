package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ClickHouse `histogram(bins)(x)` — the streaming adaptive histogram of
  * Ben-Haim & Tom-Toub ("A Streaming Parallel Decision Tree Algorithm",
  * JMLR 11, 2010; the same algorithm ClickHouse cites for its
  * AggregateFunctionHistogram). The buffer is at most `bins` weighted
  * centroids `(x, w)` kept sorted by x; inserting a value appends a
  * unit centroid and, when over capacity, merges the two adjacent
  * centroids with the smallest gap into their weighted mean. Merging
  * two buffers concatenates and compacts the same way — fully
  * mergeable, so partial aggregation is map-side and the shuffle
  * carries ≤ `bins` 16-byte pairs per (group × partition) no matter the
  * row count.
  *
  * Exactness property (what q77's oracle pins): equal values always
  * have gap 0 and merge FIRST, losslessly (the weighted mean of equal
  * x's is x) — so whenever a group's distinct-value count is ≤ `bins`,
  * the result is the exact (value, count) frequency table regardless of
  * partitioning or merge order. Past `bins` distinct values the result
  * is approximate and (like ClickHouse's) mildly merge-order-dependent;
  * the spec pins the invariants that survive any order: bin count,
  * total weight, weighted mean, sorted support and min/max envelope.
  *
  * Ties in the min-gap scan break to the LEFTMOST pair — deterministic
  * for a given insertion order.
  */
object AdaptiveHistogram {

  /** `ARRAY<STRUCT<x: DOUBLE, w: BIGINT>>` histogram of `c` with at most
    * `bins` centroids, sorted by x. */
  def histogram(c: Column, bins: Int): Column =
    ColumnBridge.col(
      HistogramAgg(ColumnBridge.expr(c), bins).toAggregateExpression())
}

/** Sorted parallel arrays of centroid positions and weights. */
class HistogramBuffer(val bins: Int) {
  var n = 0
  var xs = new Array[Double](bins + 1)
  var ws = new Array[Long](bins + 1)

  private def ensure(cap: Int): Unit = if (xs.length < cap) {
    xs = java.util.Arrays.copyOf(xs, math.max(cap, xs.length * 2))
    ws = java.util.Arrays.copyOf(ws, math.max(cap, ws.length * 2))
  }

  /** Insert at sorted position (binary search + shift; n <= bins+1). */
  def insert(x: Double, w: Long): Unit = {
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo < n && xs(lo) == x) { ws(lo) += w; return }
    ensure(n + 1)
    System.arraycopy(xs, lo, xs, lo + 1, n - lo)
    System.arraycopy(ws, lo, ws, lo + 1, n - lo)
    xs(lo) = x; ws(lo) = w; n += 1
    if (n > bins) compactOnce()
  }

  /** Merge the adjacent pair with the smallest gap (leftmost on ties). */
  private def compactOnce(): Unit = {
    var best = 0; var bestGap = Double.PositiveInfinity
    var i = 0
    while (i < n - 1) {
      val gap = xs(i + 1) - xs(i)
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    val w = ws(best) + ws(best + 1)
    // weighted mean; exact when the gap is 0 (equal values)
    xs(best) =
      if (bestGap == 0d) xs(best)
      else (xs(best) * ws(best) + xs(best + 1) * ws(best + 1)) / w
    ws(best) = w
    System.arraycopy(xs, best + 2, xs, best + 1, n - best - 2)
    System.arraycopy(ws, best + 2, ws, best + 1, n - best - 2)
    n -= 1
  }

  def mergeIn(other: HistogramBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.xs(i), other.ws(i)); i += 1 }
  }
}

case class HistogramAgg(
    child: Expression, bins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HistogramBuffer] {
  require(bins >= 2, s"bins must be >= 2, got $bins")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"input must be DOUBLE, got ${t.catalogString}")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): HistogramBuffer =
    new HistogramBuffer(bins)

  override def update(buf: HistogramBuffer, input: InternalRow): HistogramBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double], 1L)
    buf
  }

  override def merge(buf: HistogramBuffer, other: HistogramBuffer): HistogramBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: HistogramBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.xs(i), buf.ws(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: HistogramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.bins)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeDouble(buf.xs(i)); out.writeLong(buf.ws(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HistogramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new HistogramBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren(0))
}
