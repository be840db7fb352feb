package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable SpaceSaving summary (Metwally et al. ICDT'05; merge rule
  * after Agarwal et al. "Mergeable Summaries", PODS'12) — the sketch
  * behind ClickHouse's `topK`/`topKWeighted`. Tracks at most `capacity`
  * (item, est, err) counters with the invariants
  *
  *   est − err ≤ true-count ≤ est          (per tracked item)
  *   true-count ≤ min-est over counters    (for any absent item, when full)
  *
  * update: a hit increments `est`; a miss on a full summary evicts the
  * min-est counter and inherits its est as the new item's error bound.
  * merge: absent keys contribute their summary's min-est to BOTH est and
  * err (zero when that summary never filled — absence then proves
  * count 0), keys are re-truncated to the top `capacity` by est. Both
  * invariants survive update and merge, which is exactly what the q58
  * oracle re-checks row-by-row against exact counts.
  */
class SpaceSavingBuffer(val capacity: Int) {
  /** item → (est, err); size bounded by capacity. */
  val counters = new mutable.HashMap[String, (Long, Long)]()
  /** True once an eviction (or truncating merge) happened — until then
    * absence of a key proves its count is zero. */
  var filled = false

  private def minEst: Long =
    if (counters.isEmpty) 0L else counters.valuesIterator.map(_._1).min

  def update(item: String): Unit = update(item, 1L)

  /** Weighted update (ClickHouse `topKWeighted`): counts the item
    * `weight` times in one step — identical invariants (a weight-w hit
    * is w unit hits; an eviction inherits the min est as error exactly
    * as the unit case does). Non-positive weights are ignored. */
  def update(item: String, weight: Long): Unit = {
    if (weight <= 0) return
    counters.get(item) match {
      case Some((est, err)) => counters.update(item, (est + weight, err))
      case None if counters.size < capacity =>
        counters.update(item, (weight, 0L))
      case None =>
        filled = true
        val (evictKey, (m, _)) = counters.minBy { case (k, (est, _)) => (est, k) }
        counters.remove(evictKey)
        counters.update(item, (m + weight, m))
    }
  }

  def merge(other: SpaceSavingBuffer): Unit = {
    val mSelf = if (filled) minEst else 0L
    val mOther = if (other.filled) other.minEst else 0L
    val keys = counters.keySet ++ other.counters.keySet
    val merged = keys.iterator.map { k =>
      val (ea, ra) = counters.getOrElse(k, (mSelf, mSelf))
      val (eb, rb) = other.counters.getOrElse(k, (mOther, mOther))
      k -> (ea + eb, ra + rb)
    }.toSeq
    counters.clear()
    if (merged.size > capacity) {
      filled = true
      // keep top-capacity by est; key tie-break keeps truncation deterministic
      merged.sortBy { case (k, (est, _)) => (-est, k) }
        .take(capacity).foreach { case (k, v) => counters.update(k, v) }
    } else {
      filled = filled || other.filled
      merged.foreach { case (k, v) => counters.update(k, v) }
    }
  }
}

/** array<struct<term, est, err>> of the summary's counters, est-desc
  * (term-asc tie-break). `child` is the item column; rows with a null
  * item are ignored. With `weight` set (ClickHouse `topKWeighted`),
  * each row counts its long weight; null or non-positive weights are
  * ignored. */
case class SpaceSavingTopK(
    child: Expression, capacity: Int,
    weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] {
  require(capacity >= 1)

  override def children: Seq[Expression] = child +: weight.toSeq

  // analysis-time contract (ExpectsInputTypes needs the private[sql]
  // AbstractDataType, so the check is spelled directly) — without it a
  // mistyped column would ClassCastException mid-task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"item must be STRING, got ${child.dataType.catalogString}")
    else weight match {
      case Some(w) if w.dataType != LongType && w.dataType != IntegerType =>
        TypeCheckResult.TypeCheckFailure(
          s"weight must be BIGINT or INT, got ${w.dataType.catalogString}")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight match {
        case None => 1L
        case Some(we) => we.eval(input) match {
          case null => 0L
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case other => throw new IllegalStateException(
            s"unexpected weight value $other") // unreachable after type check
        }
      }
      buf.update(v.asInstanceOf[UTF8String].toString, w)
    }
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val rows = buf.counters.toSeq
      .sortBy { case (k, (est, _)) => (-est, k) }
      .map { case (k, (est, err)) =>
        InternalRow(UTF8String.fromString(k), est, err)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeBoolean(buf.filled)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (k, (est, err)) =>
      // length-prefixed raw UTF-8, not writeUTF: a tracked term over
      // 64 KB (one giant unbroken token) would make writeUTF throw at
      // shuffle time
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(est); out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    buf.filled = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      val est = in.readLong(); val err = in.readLong()
      buf.counters.update(k, (est, err))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
}
