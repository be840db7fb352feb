package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.ImageDedup.ImagePixels

/** 64-bit perceptual difference-hash (dHash) of a binary image payload:
  * decode pixels → box-average to a 9×8 grid → 64 horizontal gradient
  * sign bits. NULL (not an error) when the payload has no pixel path —
  * see [[graft.operators.ImageDedup.ImagePixels.decodeGray]] for the
  * decode scope. Decode + hash fuse into one map-side pass over the
  * payload bytes inside whole-stage codegen ([[UnaryEvalCodegen]]);
  * only the 8-byte result ever leaves the projection. */
case class ImageDHash(child: Expression)
    extends UnaryExpression with UnaryEvalCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"((java.lang.Long) $x).longValue()"

  override def nullSafeEval(input: Any): Any =
    ImagePixels.dhashOf(input.asInstanceOf[Array[Byte]])
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit perceptual average-hash (aHash): 8×8 grid, bit = cell above
  * the integer grid mean. Same decode scope and NULL contract as
  * [[ImageDHash]]. */
case class ImageAHash(child: Expression)
    extends UnaryExpression with UnaryEvalCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"((java.lang.Long) $x).longValue()"

  override def nullSafeEval(input: Any): Any =
    ImagePixels.ahashOf(input.asInstanceOf[Array[Byte]])
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit audio energy-envelope hash (65-frame RMS contour gradient
  * signs) of a binary audio payload, container-dispatched: WAV/RIFF,
  * AIFF/AIFC, or Sun .au (r11). Same NULL contract and codegen shape
  * as [[ImageDHash]] — see [[graft.operators.AudioDedup.WavPcm]] /
  * `AiffPcm` / `AuPcm` for the per-container decode scope. */
case class AudioEnergyHash(child: Expression)
    extends UnaryExpression with UnaryEvalCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"((java.lang.Long) $x).longValue()"

  override def nullSafeEval(input: Any): Any =
    graft.operators.AudioDedup.hashOfAny(input.asInstanceOf[Array[Byte]])
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit temporal-mean video dHash (per-pixel mean of all decoded
  * frames → 9×8 dHash), container-dispatched: animated GIF
  * ([[graft.operators.VideoDedup.GifPixels]]) or MJPEG-AVI
  * ([[graft.operators.MotionJpeg.AviPixels]], r11). Same NULL
  * contract and codegen shape as [[ImageDHash]]. */
case class VideoAvgHash(child: Expression)
    extends UnaryExpression with UnaryEvalCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"((java.lang.Long) $x).longValue()"

  override def nullSafeEval(input: Any): Any =
    graft.operators.VideoDedup
      .avgHashOf(input.asInstanceOf[Array[Byte]])
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-frame dHash SEQUENCE of a binary video payload (GIF composited
  * full-canvas frames or MJPEG-AVI frames, in playback order) — the
  * order-sensitive video surface q108 blocks on. ArrayType(Long);
  * NULL when undecodable. Same fused decode+hash map-side shape as
  * [[VideoAvgHash]]; only 8 bytes per frame leave the projection. */
case class VideoFrameHashes(child: Expression)
    extends UnaryExpression with UnaryEvalCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  override def nullSafeEval(input: Any): Any =
    graft.operators.VideoDedup
      .frameHashesOf(input.asInstanceOf[Array[Byte]])
      .map(hs => new GenericArrayData(hs.toArray)).orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BOTH video surfaces from ONE decode pass (r13):
  * struct(avg: long, fhs: array<long>) — the temporal-mean dHash and
  * the per-frame dHash sequence [[graft.operators.VideoDedup
  * .bothHashesOf]] accumulates in a single frame stream. NULL when
  * undecodable. A dual-form video dedup ([[graft.operators.VideoDedup
  * .bothFormsPairs]]) evaluates this once instead of [[VideoAvgHash]]
  * AND [[VideoFrameHashes]] separately — at crawl scale the decode is
  * the dominant map-side CPU, so one pass halves it. */
case class VideoBothHashes(child: Expression)
    extends UnaryExpression with UnaryEvalCodegen {
  override def dataType: DataType = StructType(Seq(
    StructField("avg", LongType, nullable = false),
    StructField("fhs", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.InternalRow) $x"

  override def nullSafeEval(input: Any): Any =
    graft.operators.VideoDedup
      .bothHashesOf(input.asInstanceOf[Array[Byte]])
      .map { case (avg, fhs) =>
        new GenericInternalRow(Array[Any](avg,
          new GenericArrayData(fhs.toArray)))
      }.orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-decode disposition of a binary media payload
  * ([[graft.operators.Multimodal.MediaDecoder.contentReason]]): "ok",
  * "corrupt", "oversized", "unsupported", "opaque", or — for a NULL
  * payload — "missing". Never NULL: a census consumer wants every row
  * classified, so the null input maps to its own reason instead of the
  * default null-propagation (which, combined with nullable=false,
  * would have let codegen skip the child null check and NPE inside
  * contentReason — the r10 ADVICE finding; eval and doGenCode are
  * overridden together so both paths share [[reasonOf]]). */
case class MediaReason(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  /** Shared by the interpreted and generated paths (public so the
    * generated code can call it). */
  def reasonOf(v: Any): AnyRef =
    UTF8String.fromString(
      if (v == null) "missing"
      else graft.operators.Multimodal.MediaDecoder
        .contentReason(v.asInstanceOf[Array[Byte]]))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    reasonOf(child.eval(input))

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("expr", this)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          (org.apache.spark.unsafe.types.UTF8String) $ref.reasonOf(
            ${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
