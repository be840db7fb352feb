package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `groupBitmap` family over [[Roaring64]] — the aggregate twin of
  * the roaring series-state the reference holds per shard
  * (output/clickhouse.go:65,110-130):
  *
  *  - [[GroupBitmap]]  (`groupBitmap(x)`): exact distinct count of a BIGINT
  *    column; state is the compressed bitmap, not the value set.
  *  - [[GroupBitmapState]] (`groupBitmapState(x)`): the serialized bitmap
  *    itself — ClickHouse's `-State` combinator — for two-level plans that
  *    build per-(fine key) bitmaps once and re-aggregate them many ways.
  *  - [[BitmapCombine]] (`groupBitmapOrCard/AndCard/XorCard(state)`): merge
  *    serialized states by ∪ / ∩ / △ and return the cardinality —
  *    ClickHouse `groupBitmapOr/And/Xor` over `AggregateFunction(groupBitmap)`
  *    columns.
  *
  * Scale shape: the shuffle carries compressed bitmaps (≤ 2 B per sparse
  * member, ≤ 8 KiB per dense 64 Ki-chunk), all three combine steps are
  * associative + commutative so partial aggregation applies, and the
  * two-level form turns "distinct users present in EVERY slice" — a
  * relational double `count(distinct)` with an expand — into one exchange of
  * bitmap states. Input must be BIGINT (value or xxhash64 fingerprint), the
  * same discipline as [[BoundedDistinct]]; nulls are ignored per the
  * ClickHouse uniq-family / bitmap convention.
  */
abstract class RoaringAggBase extends TypedImperativeAggregate[Roaring64] {
  /** The single BIGINT input (value or fingerprint). */
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"input must be BIGINT (value or fingerprint), got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  override def createAggregationBuffer(): Roaring64 = new Roaring64()
  override def update(buf: Roaring64, input: InternalRow): Roaring64 = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long]) // NULLs skipped, like count(distinct)
    buf
  }
  override def merge(buf: Roaring64, other: Roaring64): Roaring64 = {
    buf.or(other)
    buf
  }
  override def serialize(buf: Roaring64): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Roaring64 =
    Roaring64.deserialize(bytes)
  override def nullable: Boolean = false
}

/** Exact distinct count via roaring bitmap: `groupBitmap(child)` → BIGINT. */
case class GroupBitmap(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends RoaringAggBase {
  override def dataType: DataType = LongType
  override def eval(buf: Roaring64): Any = buf.cardinality

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupBitmap =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupBitmap =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupBitmap =
    copy(child = newChildren(0))
}

/** `groupBitmapState(child)` → BINARY serialized [[Roaring64]] (the `-State`
  * combinator): feed the result to [[BitmapCombine]] for ∪/∩/△ re-merges. */
case class GroupBitmapState(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends RoaringAggBase {
  override def dataType: DataType = BinaryType
  override def eval(buf: Roaring64): Any = buf.serialize()

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupBitmapState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupBitmapState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupBitmapState =
    copy(child = newChildren(0))
}

/** Combine buffer for [[BitmapCombine]]: ∩ needs an explicit "no input yet"
  * state (its identity is the full set, which has no finite bitmap), so the
  * buffer tracks whether any state has been folded in. For ∪ and △ the empty
  * bitmap IS the identity and `seen` only matters for the zero-row group. */
final class CombineBuf(var bm: Roaring64, var seen: Boolean) {
  def this() = this(new Roaring64(), false)
}

/** Merge serialized bitmap states by `op` (`or` | `and` | `xor`), returning
  * the cardinality: ClickHouse `groupBitmapOr/And/Xor`. Zero-state groups
  * evaluate to 0. */
case class BitmapCombine(
    child: Expression, op: String,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CombineBuf] {
  require(Set("or", "and", "xor")(op), s"op must be or|and|xor, got $op")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"input must be BINARY groupBitmapState, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): CombineBuf = new CombineBuf()

  private def fold(buf: CombineBuf, bm: Roaring64): CombineBuf = {
    if (!buf.seen) { buf.bm = bm; buf.seen = true }
    else op match {
      case "or" => buf.bm.or(bm)
      case "and" => buf.bm = buf.bm.and(bm)
      case "xor" => buf.bm = buf.bm.xor(bm)
    }
    buf
  }

  override def update(buf: CombineBuf, input: InternalRow): CombineBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, Roaring64.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: CombineBuf, other: CombineBuf): CombineBuf =
    if (!other.seen) buf else fold(buf, other.bm)

  override def eval(buf: CombineBuf): Any = buf.bm.cardinality

  override def serialize(buf: CombineBuf): Array[Byte] = {
    val body = buf.bm.serialize()
    val out = new Array[Byte](body.length + 1)
    out(0) = if (buf.seen) 1 else 0
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }
  override def deserialize(bytes: Array[Byte]): CombineBuf =
    new CombineBuf(
      Roaring64.deserialize(java.util.Arrays.copyOfRange(bytes, 1, bytes.length)),
      bytes(0) == 1)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapCombine =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapCombine =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapCombine =
    copy(child = newChildren(0))
}

/** Column-API entry points for the bitmap family. */
object BitmapAgg {
  import ColumnBridge._

  def groupBitmap(c: Column): Column =
    col(GroupBitmap(expr(c)).toAggregateExpression())
  def groupBitmapState(c: Column): Column =
    col(GroupBitmapState(expr(c)).toAggregateExpression())
  def groupBitmapOrCard(c: Column): Column =
    col(BitmapCombine(expr(c), "or").toAggregateExpression())
  def groupBitmapAndCard(c: Column): Column =
    col(BitmapCombine(expr(c), "and").toAggregateExpression())
  def groupBitmapXorCard(c: Column): Column =
    col(BitmapCombine(expr(c), "xor").toAggregateExpression())
}
