package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `sumMap` / `minMap` / `maxMap` family (docs:
  * "Totals/min/max the `value` array according to the keys specified in
  * the `key` array; returns a tuple of two arrays: keys in sorted order,
  * and values (summed/…) for the corresponding keys") as one mergeable
  * Catalyst aggregate. Each input row contributes a (keys[], values[])
  * pair; the buffer folds them into a key→value map under the chosen
  * combiner and `eval` emits a `MAP<STRING, DECIMAL(18,4)>` with keys in
  * sorted order (matching ClickHouse's sorted-tuple contract).
  *
  * Values are DECIMAL(18,4), not DOUBLE, accumulated as exact
  * `BigDecimal` — the same order-independence discipline as the query
  * families' `dsum` (double addition is not associative; a map-merge
  * aggregate whose result depended on partition merge order could never
  * be oracle-pinned).
  *
  * Scale shape: the buffer is one entry per DISTINCT KEY per (group ×
  * partition) — for map-typed telemetry (per-metric counters, per-type
  * revenue) that is dozens of entries regardless of row count, so the
  * shuffle carries bounded maps, map-side combined, exactly like the
  * sketch aggregates ([[SpaceSaving]], [[BoundedDistinct]]). Feeding a
  * prior sumMap's output back in via (`map_keys`, `map_values`) is the
  * ClickHouse `sumMapMerge` combinator shape — level-2 merges consume
  * level-1 maps without re-touching rows (see q76).
  */
object MapCombine {

  /** Ops: fold semantics per key. */
  val Sum = "sum"; val Min = "min"; val Max = "max"

  private def agg(op: String, keys: Column, values: Column): Column =
    ColumnBridge.col(
      MapCombineAgg(ColumnBridge.expr(keys), ColumnBridge.expr(values), op)
        .toAggregateExpression())

  /** Per-key exact DECIMAL sum of `values` grouped by parallel `keys`. */
  def sumMap(keys: Column, values: Column): Column = agg(Sum, keys, values)

  /** Per-key minimum. */
  def minMap(keys: Column, values: Column): Column = agg(Min, keys, values)

  /** Per-key maximum. */
  def maxMap(keys: Column, values: Column): Column = agg(Max, keys, values)
}

class MapCombineBuffer {
  val m = new java.util.HashMap[String, java.math.BigDecimal]()

  def put(op: String, k: String, v: java.math.BigDecimal): Unit = {
    val prev = m.get(k)
    val next =
      if (prev == null) v
      else op match {
        case MapCombine.Sum => prev.add(v)
        case MapCombine.Min => prev.min(v)
        case MapCombine.Max => prev.max(v)
      }
    m.put(k, next)
    ()
  }
}

/** `keys`: ARRAY<STRING>, `values`: ARRAY<DECIMAL(18,4)> — parallel
  * arrays per row (ClickHouse requires equal sizes; enforced here). */
case class MapCombineAgg(
    keys: Expression, values: Expression, op: String,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MapCombineBuffer] {
  require(op == MapCombine.Sum || op == MapCombine.Min || op == MapCombine.Max,
    s"unknown op $op")

  /** Input rows are DECIMAL(<=38,4); the OUTPUT is DECIMAL(38,4) —
    * per-key sums are unbounded by row count, so emitting the input's
    * narrow type would overflow exactly when the aggregate is doing its
    * job (~10^15 accumulated at 18,4). 38,4 holds ~10^34 — beyond any
    * realistic accumulation — and the level-2 `-Merge` feed-back (q76)
    * type-checks because inputs up to precision 38 are accepted. */
  private val outType = DecimalType(38, 4)
  private lazy val inType: DecimalType = values.dataType match {
    case ArrayType(d: DecimalType, _) => d
    case _ => DecimalType(18, 4) // unreachable past checkInputDataTypes
  }

  override def children: Seq[Expression] = Seq(keys, values)

  override def checkInputDataTypes(): TypeCheckResult =
    (keys.dataType, values.dataType) match {
      case (ArrayType(StringType, _), ArrayType(d: DecimalType, _))
          if d.precision <= 38 && d.scale == 4 => TypeCheckResult.TypeCheckSuccess
      case (kt, vt) => TypeCheckResult.TypeCheckFailure(
        s"expected (ARRAY<STRING>, ARRAY<DECIMAL(<=38,4)>), got " +
          s"(${kt.catalogString}, ${vt.catalogString})")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, outType, false)

  override def createAggregationBuffer(): MapCombineBuffer = new MapCombineBuffer

  override def update(buf: MapCombineBuffer, input: InternalRow): MapCombineBuffer = {
    val ks = keys.eval(input).asInstanceOf[ArrayData]
    val vs = values.eval(input).asInstanceOf[ArrayData]
    if (ks != null && vs != null) {
      require(ks.numElements() == vs.numElements(),
        s"sumMap key/value arrays differ in size: ${ks.numElements()} vs ${vs.numElements()}")
      var i = 0
      while (i < ks.numElements()) {
        if (!ks.isNullAt(i) && !vs.isNullAt(i)) {
          val k = ks.getUTF8String(i).toString
          val v = vs.getDecimal(i, inType.precision, inType.scale)
            .toJavaBigDecimal
          buf.put(op, k, v)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: MapCombineBuffer, other: MapCombineBuffer): MapCombineBuffer = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.put(op, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: MapCombineBuffer): Any = {
    val sorted = buf.m.keySet().toArray(Array.empty[String]).sorted
    val ks = new GenericArrayData(
      sorted.map(k => UTF8String.fromString(k): Any))
    val vs = new GenericArrayData(sorted.map { k =>
      Decimal(buf.m.get(k), outType.precision, outType.scale): Any
    })
    new ArrayBasedMapData(ks, vs)
  }

  override def serialize(buf: MapCombineBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      // fixed scale 4: ship the unscaled value as length-prefixed bytes
      // (NOT longValueExact — an accumulated sum past ~10^15 at scale 4
      // would throw mid-shuffle; BigInteger bytes are exact at any size)
      val unscaled = e.getValue.setScale(4).unscaledValue().toByteArray
      out.writeInt(unscaled.length)
      out.write(unscaled)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MapCombineBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MapCombineBuffer
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = in.readUTF()
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val v = new java.math.BigDecimal(new java.math.BigInteger(bytes), 4)
      buf.put(op, k, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapCombineAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapCombineAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MapCombineAgg =
    copy(keys = newChildren(0), values = newChildren(1))
}
