package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact smallest-n selection of (priority, id) pairs as a mergeable
  * bounded buffer — the skew-immune engine behind per-key quotas
  * ([[graft.operators.SourceQuota]]). A `row_number() <= n` window sorts
  * EVERY row of a key inside one task, so one mega-key (a head domain
  * with billions of docs) serializes the whole stage at 100 TB. This
  * aggregate instead keeps at most `n` pairs per key *per partition*
  * (map-side partial aggregation), so the shuffle moves only bounded
  * summaries and a mega-key costs its scan, never a sort.
  *
  * Ordering is the total order (priority, id) ascending — exact and
  * deterministic, no sampling, no threshold estimation. Bound: a
  * max-at-top heap; an incoming pair is admitted iff the buffer is
  * under n or the pair precedes the current maximum (which is then
  * evicted). Merge inserts the other buffer's pairs under the same
  * rule; since each side holds its own true smallest-n, the union's
  * smallest-n is contained in the merged candidates — exactness is
  * preserved by construction.
  */
class TopNBuffer(val n: Int) {
  // max-first: the pair to evict is always at the head
  val heap = new java.util.PriorityQueue[(Long, Long)](
    math.max(1, n),
    new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    })

  def insert(pri: Long, id: Long): Unit = {
    if (heap.size < n) heap.add((pri, id))
    else {
      val top = heap.peek()
      if (pri < top._1 || (pri == top._1 && id < top._2)) {
        heap.poll()
        heap.add((pri, id))
      }
    }
  }

  def merge(other: TopNBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (p, i) = it.next(); insert(p, i) }
  }

  /** (priority, id) ascending — rank i is element i. */
  def sorted: Array[(Long, Long)] = {
    val arr = new Array[(Long, Long)](heap.size)
    heap.toArray(arr)
    java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    arr
  }
}

/** array<struct<pri, id>> of the key's exact smallest-n pairs by
  * (pri, id) ascending. Rows with a null id or priority are ignored. */
case class BoundedTopN(
    priority: Expression, id: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopNBuffer] {
  require(n >= 1)

  override def children: Seq[Expression] = Seq(priority, id)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (priority.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"priority must be BIGINT, got ${priority.dataType.catalogString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"id must be BIGINT, got ${id.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pri", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopNBuffer = new TopNBuffer(n)

  override def update(buf: TopNBuffer, input: InternalRow): TopNBuffer = {
    val p = priority.eval(input)
    val i = id.eval(input)
    if (p != null && i != null)
      buf.insert(p.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopNBuffer, other: TopNBuffer): TopNBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: TopNBuffer): Any =
    new GenericArrayData(
      buf.sorted.map { case (p, i) => InternalRow(p, i) }.toArray[Any])

  override def serialize(buf: TopNBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val (p, i) = it.next()
      out.writeLong(p); out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopNBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopNBuffer(in.readInt())
    val sz = in.readInt()
    var k = 0
    while (k < sz) { buf.insert(in.readLong(), in.readLong()); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopN =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopN =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopN =
    copy(priority = newChildren(0), id = newChildren(1))
}
