package graft.functions

import scala.collection.immutable.ArraySeq

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership pre-probe against a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] over 64-bit
  * fingerprints: `false` PROVES the fingerprint is not in the indexed
  * set (no false negatives), `true` means "maybe" and is settled by the
  * exact join that follows. Used to reject the overwhelmingly-new part
  * of a daily crawl map-side, before anything reaches the
  * history-sized probe join.
  *
  * The sketch rides the plan (like [[RarestPrefix]]'s stop table): an
  * `ArraySeq[Byte]` — primitive-backed, so case-class equality stays
  * structural for canonicalization/subexpression elimination without
  * boxing — deserialized once per task. ~1.2 MB per 10^6 indexed docs
  * at 1% fpp; past the task-binary comfort zone (~10^8 docs) the
  * deployment moves the same probe into a broadcast variable, which
  * changes no semantics. */
case class BloomMightContain(child: Expression, bloomBytes: ArraySeq[Byte])
    extends UnaryExpression with UnaryEvalCodegen {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes.toArray))

  override def dataType: DataType = BooleanType
  override protected def castResult(x: String): String =
    s"((java.lang.Boolean) $x).booleanValue()"

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(filter.mightContainLong(input.asInstanceOf[Long]))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
