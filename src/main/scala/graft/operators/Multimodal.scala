package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shape —
  * schema, per-partition batch iteration, decode-fn signature — is real,
  * and so is the image-header decode: [[MediaDecoder.decode]] parses
  * PNG / JPEG / GIF / BMP container headers (magic + dimension fields,
  * pure JVM, no codec dependency) for real width/height. Payloads in no
  * recognized container fall back to [[MediaDecoder.decodeStub]]'s
  * deterministic pseudo-metadata (full pixel decode of arbitrary codecs
  * would need an external library — JavaCV, TwelveMonkeys — which slots
  * in here without touching the pipeline).
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

    /** Real container-header decode: returns (format, width, height) for
      * payloads carrying a recognizable PNG / JPEG / GIF / BMP header,
      * None otherwise. Header-only parsing (the industry-standard fast
      * path for corpus metadata extraction — pixel data is never
      * touched), so it is O(header bytes) per record regardless of
      * payload size. */
    def decodeHeader(p: Array[Byte]): Option[(String, Int, Int)] = {
      def u8(i: Int): Int = p(i) & 0xff
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
          u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
          u8(7) == 0x0a) {
        // PNG: first chunk must be IHDR; width/height are BE u32 at 16/20
        if (u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
          Some(("png", be32(16), be32(20)))
        else None
      } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk marker segments to the first SOFn (C0-CF minus the
        // non-frame C4/C8/CC); height/width are BE u16 after precision
        var i = 2
        var out: Option[(String, Int, Int)] = None
        var done = false
        while (!done && i + 3 < p.length) {
          if (u8(i) != 0xff) { done = true }
          else {
            val marker = u8(i + 1)
            if (marker == 0xff) i += 1 // fill bytes before a marker
            else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7))
              i += 2 // standalone markers, no length field
            else if (marker == 0xd9 || marker == 0xda)
              done = true // EOI / start-of-scan: no SOF seen
            else {
              val len = be16(i + 2)
              if (len < 2 || i + 2 + len > p.length) done = true
              else if (marker >= 0xc0 && marker <= 0xcf &&
                  marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
                if (len >= 7)
                  out = Some(("jpeg", be16(i + 7), be16(i + 5)))
                done = true
              } else i += 2 + len
            }
          }
        }
        out
      } else if (p.length >= 13 && u8(0) == 'G' && u8(1) == 'I' &&
          u8(2) == 'F' && u8(3) == '8' &&
          (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
        // GIF: logical screen descriptor, LE u16 at 6/8
        Some(("gif", le16(6), le16(8)))
      } else if (p.length >= 26 && u8(0) == 'B' && u8(1) == 'M' &&
          le32(14) >= 40) {
        // BMP with BITMAPINFOHEADER+: signed LE i32 at 18/22; negative
        // height = top-down row order, dimension is the magnitude
        Some(("bmp", le32(18), math.abs(le32(22))))
      } else None
    }

    /** Decode one record: real header parse when the payload is a
      * recognized image container (kind = detected format, n_frames = 1,
      * offset 0 — single-frame stills), deterministic stub otherwise. */
    def decode(r: MediaRecord): MediaMeta = decodeHeader(r.payload) match {
      case Some((fmt, w, h)) =>
        MediaMeta(r.media_id, fmt, r.payload.length.toLong, w, h, 1, 0L)
      case None => decodeStub(r)
    }

    /** Fallback for payloads in no recognized container: deterministic
      * pseudo-metadata from the payload size, so the plumbing stays
      * testable end-to-end on opaque payloads. A full pixel/codec decode
      * (needs an external library) would replace this branch. */
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

  /** Minimal-but-valid single-image containers, built from (w, h): real
    * binary headers with correct magic, endianness, and (for PNG) chunk
    * CRCs — what [[MediaDecoder.decodeHeader]] parses back. Fixed sizes
    * ([[PngBytes]]…): header-only stills, no pixel payload, which is
    * exactly what a header decode is allowed to rely on. */
  object MediaBuild {
    val PngBytes = 45L   // 8 sig + 25 IHDR chunk + 12 IEND chunk
    val JpegBytes = 23L  // SOI + 19-byte SOF0 segment + EOI
    val GifBytes = 13L   // sig + logical screen descriptor
    val BmpBytes = 54L   // 14 file header + 40 BITMAPINFOHEADER

    def png(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(45) // big-endian default
      out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      val ihdr = java.nio.ByteBuffer.allocate(17)
      ihdr.put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
        .put(0.toByte)
      val crc = new java.util.zip.CRC32
      crc.update(ihdr.array())
      out.putInt(13).put(ihdr.array()).putInt(crc.getValue.toInt)
      val iend = new java.util.zip.CRC32
      iend.update("IEND".getBytes("US-ASCII"))
      out.putInt(0).put("IEND".getBytes("US-ASCII"))
        .putInt(iend.getValue.toInt)
      out.array()
    }

    def jpeg(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(23)
      out.put(0xff.toByte).put(0xd8.toByte)                // SOI
      out.put(0xff.toByte).put(0xc0.toByte).putShort(17)   // SOF0, len
      out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      out.put(3.toByte)                                    // 3 components
      for (c <- 1 to 3)
        out.put(c.toByte).put(0x11.toByte).put(0.toByte)
      out.put(0xff.toByte).put(0xd9.toByte)                // EOI
      out.array()
    }

    def gif(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(13)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("GIF89a".getBytes("US-ASCII"))
      out.putShort(w.toShort).putShort(h.toShort)
      out.put(0.toByte).put(0.toByte).put(0.toByte)
      out.array()
    }

    def bmp(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(54)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54)
        .putShort(0.toShort).putShort(0.toShort).putInt(54)
      out.putInt(40).putInt(w).putInt(h).putShort(1.toShort)
        .putShort(24.toShort)
      out.array() // remaining 24 header bytes stay zero
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
      batch.map(MediaDecoder.decode)
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
