package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shape —
  * schema, per-partition batch iteration, decode-fn signature — is real;
  * the actual media decode is STUBBED deterministically because no
  * image/audio codec library ships in this environment. Swap
  * [[MediaDecoder.decodeStub]] for a real codec (JavaCV, TwelveMonkeys…)
  * without touching the pipeline.
  */
object Multimodal {

  /** Input record: one media object. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted metadata + features. `frame_offsets` shows the
    * frame-sampling shape (every `frameStep` bytes stands in for every
    * n-th frame). */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      size_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      first_frame_offset: Long)

  object MediaDecoder {
    /** ??? in spirit: a real decoder parses the container/codec here.
      * The stub derives deterministic pseudo-metadata from the payload
      * size so tests can pin the plumbing end-to-end. */
    def decodeStub(r: MediaRecord): MediaMeta = {
      val size = r.payload.length.toLong
      MediaMeta(
        media_id = r.media_id,
        kind = r.kind,
        size_bytes = size,
        width = (size % 640).toInt,
        height = (size % 480).toInt,
        n_frames = (size / 100).toInt + 1,
        first_frame_offset = size % 100)
    }
  }

  /** The decode stage: one decoder instance per partition (mirroring how
    * a real codec context is expensive to construct), record-batch
    * iteration inside. This is the Scala analog of `mapInPandas`: the
    * per-partition iterator IS the batch stream. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition decoder construction happens here in a real codec
      batch.map(MediaDecoder.decodeStub)
    }
  }

  /** Frame-sample: byte-range slices standing in for frame grabs. Returns
    * (media_id, frame_idx, frame_bytes). */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int, frameSize: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = r.payload.length / math.max(1, frameSize)
      (0 until n by everyN).map { i =>
        val from = i * frameSize
        val until = math.min(r.payload.length, from + frameSize)
        (r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Lift a text column into a binary media frame for testing: the
    * payload is the UTF-8 encoding of the text. */
  def asMedia(df: DataFrame, idCol: String, textCol: String, kind: String)
      (implicit s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
