package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `uniqUpTo(N)(x)` (docs: "calculates the number of
  * different values of the argument up to N; if the number of distinct
  * values is greater than N, returns N+1") as a mergeable bounded-state
  * aggregate. The buffer is the set of the first N+1 distinct values
  * seen — sufficient for exactness: if the true distinct count is ≤ N
  * the set holds exactly those values, and once the set reaches N+1 the
  * answer is pinned at N+1 no matter what else arrives, so insertion
  * stops (saturation). Merge unions under the same cap; since
  * saturation only ever discards values that could not change the
  * capped answer, partial aggregation is exact by construction.
  *
  * Scale shape: per-(key × partition) state is ≤ N+1 longs — the
  * map-side-combinable answer to "how many distinct, capped" that
  * `count(distinct x)` cannot give (its state is the full value set, an
  * expand + re-shuffle in Spark's plan). The input is a BIGINT key:
  * pass the value itself for integer columns or an 8-byte fingerprint
  * (`Hashes.xxhash64Seed0`) for strings — the same fingerprint-not-text
  * discipline as the dedup operators (collision odds 2^-64). Nulls are
  * ignored, matching ClickHouse's uniq* family over Nullable columns.
  */
class UniqUpToBuffer(val n: Int) {
  val set = new java.util.HashSet[java.lang.Long]()

  def insert(v: Long): Unit =
    if (set.size <= n) { set.add(v); () } // cap N+1: admit while size ≤ n

  def merge(other: UniqUpToBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext && set.size <= n) { set.add(it.next()); () }
  }

  def result: Int = math.min(set.size, n + 1)
}

/** BIGINT distinct count of `child`, saturating at n+1. */
case class BoundedDistinct(
    child: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[UniqUpToBuffer] {
  require(n >= 1)

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"input must be BIGINT (value or fingerprint), got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): UniqUpToBuffer = new UniqUpToBuffer(n)

  override def update(buf: UniqUpToBuffer, input: InternalRow): UniqUpToBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: UniqUpToBuffer, other: UniqUpToBuffer): UniqUpToBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: UniqUpToBuffer): Any = buf.result.toLong

  override def serialize(buf: UniqUpToBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): UniqUpToBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new UniqUpToBuffer(in.readInt())
    val sz = in.readInt()
    var k = 0
    while (k < sz) { buf.insert(in.readLong()); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedDistinct =
    copy(child = newChildren(0))
}
