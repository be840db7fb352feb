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

  /** Resize: payload byte-decimation stands in for pixel resampling — a
    * real impl decodes, scales with the codec, re-encodes. Output keeps
    * the media schema so resize stages compose with decode/sample. */
  def resize(
      media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val ratio = math.max(1,
          r.payload.length / math.max(1, targetW * targetH))
        val out = new Array[Byte]((r.payload.length + ratio - 1) / ratio)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * ratio); i += 1 }
        MediaRecord(r.media_id, r.kind, out)
      }
    }
  }

  /** Feature-extract: a fixed-width embedding per media object — here a
    * deterministic normalized byte histogram (a real impl runs a vision/
    * audio model per partition-loaded batch). Output shape matches the
    * `embeddings` table (`array<float>`), so extracted features flow
    * straight into [[Ann]] similarity search / q25 near-dup. */
  def extractFeatures(media: Dataset[MediaRecord], dims: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // model/codec context would be constructed once per partition here
      batch.map { r =>
        val hist = new Array[Float](dims)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xff) % dims) += 1f
          i += 1
        }
        val n = math.max(1, r.payload.length).toFloat
        var d = 0
        while (d < dims) { hist(d) /= n; d += 1 }
        (r.media_id, hist.toSeq)
      }
    }.toDF("media_id", "embedding")
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
