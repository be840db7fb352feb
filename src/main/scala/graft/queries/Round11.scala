package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AudioDedup, ImageDedup, JpegBuild, Multimodal,
  VideoDedup}

/** Round-11 queries: the gates for the round-10 surface that shipped
  * ungated (r10 judge directive #1) — order-sensitive video near-dup
  * (q108) and the media quarantine-reason census (q109) — plus the
  * gate for the round-11 baseline-JPEG pixel path (directive #8),
  * q110. */
object Round11 {

  /** q108: ORDER-SENSITIVE video near-dup vs the order-insensitive
    * temporal-mean hash, on one planted population — the two forms'
    * DISAGREEMENT is the gate. Three video populations per doc_id
    * (q106's frame patterns): the base 5-frame clip; the SAME frames
    * REVERSED (+1M — a re-ordered cut); +16 brightness in the original
    * order (+2M — every per-frame dHash is bit-identical, gradient
    * signs survive a uniform shift); plus opaque text (+3M — no video
    * path, skipped by both forms).
    *
    * Expected (arithmetic, no read-back):
    *  - form='mean' ([[VideoDedup.nearDupPairs]], temporal-mean dHash):
    *    all three in-trio pairs at hamming 0 — the per-pixel mean over
    *    frames is invariant to frame order and shifts uniformly under
    *    brightness, so a re-ordered cut COLLIDES (the catch-more
    *    blocking direction);
    *  - form='ordered' ([[VideoDedup.orderedNearDupPairs]], Jaccard
    *    over positional 2-grams of the per-frame dHash sequence): ONLY
    *    (id, id+2M) at jaccard 1.0 — the reversed cut shares no
    *    2-gram with the original (grams hash CONSECUTIVE frame hashes
    *    in order), while the same-order brightness copy has the
    *    identical gram set.
    * A frame-hash bug, a gram that ignores order, a Jaccard
    * denominator error, or an undecodable payload leaking into either
    * join changes the pair set and fails the gate. */
  def q108VideoOrdered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.parallel(s, dir, "documents")
    val media = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id0, text) =>
        val id = Round9.guardMediaId(id0)
        def frame(f: Int, shift: Int)(x: Int, y: Int): Int =
          Round9.videoCell(id, f, (y / 2) * 9 + x / 2) + shift
        def gif(frameIds: Seq[Int], shift: Int): Array[Byte] =
          VideoDedup.GifBuild.animatedGray(Round9.imgW, Round9.imgH,
            frameIds.map(f => frame(f, shift) _))
        Seq(
          Multimodal.MediaRecord(id, "video", gif(0 until 5, 0)),
          Multimodal.MediaRecord(id + 1000000L, "video",
            gif((0 until 5).reverse, 0)),
          Multimodal.MediaRecord(id + 2000000L, "video",
            gif(0 until 5, 16)),
          Multimodal.MediaRecord(id + 3000000L, "video",
            text.getBytes("UTF-8")))
      }
      .toDF("media_id", "kind", "payload")
    val mean = VideoDedup
      .nearDupPairs(media, "media_id", "payload", maxHamming = 3, bands = 4)
      .select(col("id_a"), col("id_b"), lit("mean").as("form"),
        col("hamming").cast("double").as("score"))
    val ordered = VideoDedup
      .orderedNearDupPairs(media, "media_id", "payload",
        q = 2, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), lit("ordered").as("form"),
        col("jaccard").as("score"))
    mean.unionByName(ordered).orderBy("form", "id_a", "id_b")
  }

  /** q109: media quarantine-reason CENSUS — forty payload
    * variants per doc spanning every reason class of
    * [[Multimodal.contentReason]] ([[graft.functions.MediaReason]],
    * exercised through its whole-stage-codegen path), grouped to
    * (variant, reason, cnt). The oracle is arithmetic: each variant
    * maps to exactly ONE reason with cnt = count(documents) — any
    * variant that decodes to a different reason (or splits across
    * reasons) produces a row the oracle does not have.
    *
    * Variants: good BMP / gray-8 PNG / palette-Adam7 PNG / gray-16
    * PNG / GIF / WAV / baseline JPEG / PROGRESSIVE JPEG (r11:
    * [[graft.operators.JpegPixels]] decodes both JPEG modes now) →
    * "ok"; an 8-bpp BMP header, an IEEE-float WAV (well-formed, out
    * of decode scope), and a 12-bit-precision JPEG (the remaining
    * external-codec seam) → "unsupported"; a truncated BMP and the
    * scan-less SOI+SOF0+EOI header twin (a broken FILE even though
    * every marker parses — reclassified from "unsupported" when the
    * pixel path landed) → "corrupt"; a PNG claiming 8192×8192 on a
    * tiny body → "oversized" (refused pre-allocation); magic-free
    * bytes → "opaque"; a NULL payload → "missing" (the r10 ADVICE NPE
    * class, now a first-class census row).
    *
    * r11 WAV-scope rows (the widened [[AudioDedup.WavPcm]] decode):
    * 8-bit PCM, 64-bit IEEE float, G.711 µ-law and a-law,
    * WAVE_FORMAT_EXTENSIBLE-wrapping-PCM16, and real 4-bit IMA ADPCM
    * → "ok"; an ADPCM tag on a 16-bit fmt and an extensible SubFormat
    * whose GUID is not the fixed media subtype →
    * "unsupported" (well-formed, outside the pure-JVM scope);
    * the extensible tag on a 16-byte fmt chunk → "corrupt" (the
    * mandatory SubFormat field cannot exist). The pre-r11 'wav_float'
    * row (format 3 at 16 bits) stays "unsupported" — the float scope
    * is 32/64-bit only.
    *
    * r11 MJPEG-AVI rows ([[graft.operators.MotionJpeg]]): a one-frame
    * MJPEG AVI and its DHT-less standard-table twin → "ok"; the same
    * container declaring an xvid codec → "unsupported" (route to the
    * external-codec path); the MJPEG file cut in half → "corrupt".
    *
    * r11 AIFF/AU rows ([[AudioDedup.AiffPcm]]/[[AudioDedup.AuPcm]]):
    * big-endian AIFF PCM16 and a µ-law .au → "ok"; a .au declaring
    * G.721 ADPCM (encoding 23) → "unsupported"; a 40-byte AIFF
    * prefix → "corrupt".
    *
    * r11 TIFF rows ([[graft.operators.TiffPixels]]): plain gray8,
    * PackBits big-endian, real LZW, and Deflate variants → "ok" (all
    * four baseline compressions decode); the same IFD declaring YCbCr
    * → "unsupported" (external-codec seam); a 40-byte prefix →
    * "corrupt". */
  def q109MediaReasonCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.parallel(s, dir, "documents")
    val media = docs.select(col("doc_id"))
      .as[Long]
      .flatMap { id0 =>
        val id = Round9.guardMediaId(id0)
        def px(x: Int, y: Int): Int =
          Round9.cellValue(id, (y / 2) * 9 + x / 2)
        val w = Round9.imgW; val h = Round9.imgH
        val bmp = ImageDedup.ImageBuild.bmp24Gray(w, h)(px)
        val pcm16Samples = Array.tabulate(520)(i => Round9.frameAmp(id, i / 8))
        val wav = AudioDedup.WavBuild.pcm16(pcm16Samples)
        val bmpRle = bmp.clone; bmpRle(28) = 8 // 8-bpp: valid, o-o-scope
        // format 3 + bits 16: a "float" width the r11 scope does NOT
        // cover (32/64 only) — stays "unsupported", oracle unchanged
        val wavFloat = wav.clone; wavFloat(20) = 3
        // ADPCM tag on a 16-bit fmt: recognized codec, wrong width
        // (real 4-bit IMA ADPCM decodes since r11 — the wav_ima row)
        val wavAdpcm = wav.clone; wavAdpcm(20) = 17
        // extensible tag on a 16-byte fmt: structurally broken
        val wavExtShort = wav.clone
        wavExtShort(20) = 0xfe.toByte; wavExtShort(21) = 0xff.toByte
        val wavExt = AudioDedup.WavBuild.extensiblePcm16(
          pcm16Samples, channels = 2, channelMask = 3)
        // extensible with a non-media SubFormat GUID tail: valid, o-o-scope
        val wavExtGuid = wavExt.clone; wavExtGuid(50) = 0x11
        val g711Codes = pcm16Samples.map(s => (s % 128).toByte)
        val aviFrames = Seq(JpegBuild.gray(w, h)((x, y) => px(x, y)))
        val avi = graft.operators.MotionJpeg.AviBuild.mjpeg(w, h, aviFrames)
        val tiff = graft.operators.TiffPixels.TiffBuild.build(w, h)(
          (x, y) => px(x, y))
        // photometric 6 (YCbCr): well-formed, outside the baseline
        // scope — patch tag 262's value word through the IFD walk
        val tiffYcbcr = {
          val c = tiff.clone
          def u16(i: Int): Int = (c(i) & 0xff) | ((c(i + 1) & 0xff) << 8)
          def u32(i: Int): Int = u16(i) | (u16(i + 2) << 16)
          val ifd = u32(4)
          val n = u16(ifd)
          var e = 0
          while (e < n) {
            val o = ifd + 2 + e * 12
            if (u16(o) == 262) { c(o + 8) = 6; c(o + 9) = 0 }
            e += 1
          }
          c
        }
        val pngHuge = ImageDedup.ImageBuild.pngGray(1, 1)((_, _) => 0)
        // IHDR dims at 16/20 (BE): claim 8192x8192 > the 2^24 pixel cap
        pngHuge(17) = 0; pngHuge(18) = 0x20; pngHuge(19) = 0
        pngHuge(21) = 0; pngHuge(22) = 0x20; pngHuge(23) = 0
        Seq[(Long, String, Array[Byte])](
          (id, "bmp", bmp),
          (id + 1000000L, "png_gray8",
            ImageDedup.ImageBuild.pngGray(w, h)(px)),
          (id + 2000000L, "png_palette_adam7",
            ImageDedup.ImageBuild.pngGray(w, h, colorType = 3, depth = 4,
              interlace = true)((x, y) => px(x, y) % 16)),
          (id + 3000000L, "png_gray16",
            ImageDedup.ImageBuild.pngGray(w, h, depth = 16)(px)),
          (id + 4000000L, "gif",
            VideoDedup.GifBuild.animatedGray(w, h, Seq(px _))),
          (id + 5000000L, "wav", wav),
          (id + 6000000L, "bmp_8bpp", bmpRle),
          (id + 7000000L, "wav_float", wavFloat),
          (id + 8000000L, "jpeg_hdr",
            Multimodal.MediaBuild.jpeg(w, h)),
          (id + 9000000L, "bmp_trunc", bmp.take(40)),
          (id + 10000000L, "png_huge", pngHuge),
          (id + 11000000L, "no_magic",
            Array[Byte](0x01, 0x7f, 0x03, 0x00, 0x42, 0x42)),
          (id + 12000000L, "missing", null),
          (id + 13000000L, "jpeg_base",
            JpegBuild.gray(w, h)((x, y) => px(x, y))),
          (id + 14000000L, "jpeg_prog",
            JpegBuild.grayProgressive(w, h)((x, y) => px(x, y))),
          (id + 15000000L, "jpeg_12bit", JpegBuild.precision12Twin(
            JpegBuild.gray(w, h)((x, y) => px(x, y)))),
          // r11 WAV-scope census rows (q104's widened decode)
          (id + 16000000L, "wav_pcm8",
            AudioDedup.WavBuild.pcm(
              Array.tabulate(520)(i => Round9.frameAmp(id, i / 8) % 256),
              bits = 8)),
          (id + 17000000L, "wav_f64",
            AudioDedup.WavBuild.float64(
              pcm16Samples.map(_ / 32768.0))),
          (id + 18000000L, "wav_ulaw",
            AudioDedup.WavBuild.g711(g711Codes, alaw = false)),
          (id + 19000000L, "wav_alaw",
            AudioDedup.WavBuild.g711(g711Codes, alaw = true)),
          (id + 20000000L, "wav_ext", wavExt),
          (id + 21000000L, "wav_adpcm", wavAdpcm),
          (id + 22000000L, "wav_ext_guid", wavExtGuid),
          (id + 23000000L, "wav_ext_short", wavExtShort),
          // r11 MJPEG-AVI census rows (q111's container)
          (id + 24000000L, "avi_mjpeg", avi),
          (id + 25000000L, "avi_nodht",
            graft.operators.MotionJpeg.AviBuild.mjpeg(w, h, Seq(
              JpegBuild.gray(w, h, standardTables = true,
                writeDht = false)((x, y) => px(x, y))))),
          (id + 26000000L, "avi_xvid",
            graft.operators.MotionJpeg.AviBuild.mjpeg(w, h,
              aviFrames, handler = "xvid")),
          (id + 27000000L, "avi_trunc", avi.take(avi.length / 2)),
          // r11: real IMA ADPCM decodes now; 'wav_adpcm' above keeps
          // pinning the 16-bit-tagged twin as unsupported
          (id + 28000000L, "wav_ima",
            AudioDedup.WavBuild.imaAdpcmMono(Seq((100, 30,
              Array.tabulate(64)(i => (Round9.frameAmp(id, i) % 256).toByte))))),
          // r11: the other two audio containers (AIFF big-endian, Sun
          // .au) — q104's +12M/+13M cross-container twins
          (id + 29000000L, "aiff",
            AudioDedup.AiffBuild.pcm16(pcm16Samples)),
          (id + 30000000L, "aiff_trunc",
            AudioDedup.AiffBuild.pcm16(pcm16Samples).take(40)),
          (id + 31000000L, "au_ulaw",
            AudioDedup.AuBuild.build(1, g711Codes.map(c =>
              (~(c & 0x7f)).toByte))),
          (id + 32000000L, "au_g721",
            AudioDedup.AuBuild.build(23, g711Codes)),
          // r11: MS-ADPCM (format 2) decodes too
          (id + 33000000L, "wav_ms",
            AudioDedup.WavBuild.msAdpcmMono(Seq((2, 100, 50, -50,
              Array.tabulate(64)(i => (Round9.frameAmp(id, i) % 256).toByte))))),
          // r11: baseline TIFF pixel path (q102's +6M container) —
          // all four in-scope compressions decode; YCbCr routes out
          (id + 34000000L, "tiff_gray", tiff),
          (id + 35000000L, "tiff_packbits",
            graft.operators.TiffPixels.TiffBuild.build(w, h,
              le = false, compression = 32773)((x, y) => px(x, y))),
          (id + 36000000L, "tiff_lzw",
            graft.operators.TiffPixels.TiffBuild.build(w, h,
              compression = 5)((x, y) => px(x, y))),
          (id + 37000000L, "tiff_trunc", tiff.take(40)),
          (id + 38000000L, "tiff_deflate",
            graft.operators.TiffPixels.TiffBuild.build(w, h,
              le = false, compression = 8)((x, y) => px(x, y))),
          (id + 39000000L, "tiff_ycbcr", tiffYcbcr))
      }
      .toDF("media_id", "variant", "payload")
    media
      .select(col("variant"),
        Multimodal.contentReason(col("payload")).as("reason"))
      .groupBy("variant", "reason")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("variant", "reason")
  }

  /** q110: baseline-JPEG content near-dup — the r11 pixel path
    * ([[graft.operators.JpegPixels]]) feeding the same dHash +
    * Hamming-band machinery as q102, on a plant built for PROVABLE
    * lossy-codec exactness: 72×64 images whose value is constant
    * within each 8×8 JPEG block (the 9×8 hash grid = the block grid),
    * encoded with [[JpegBuild]]'s all-ones quantization table. A
    * constant block has only a DC coefficient — an exact integer under
    * the spec FDCT — so encode→decode reproduces every pixel
    * bit-exactly (JpegPixelsSpec pins this for all 256 values) and
    * the cross-format pairs below hold at Hamming 0 EXACTLY, not
    * approximately. Populations per doc_id: the BMP rendering; the
    * JPEG of the same pixels (+1M); the JPEG of +16 brightness (+2M —
    * DC-only change, dHash compares adjacent cells so the shift
    * cancels); opaque text (+3M, decodes nowhere, pairs never); and
    * the PROGRESSIVE encoding of the same pixels (+4M — two scans,
    * DC then AC band; same quantized coefficients, so the exactness
    * argument carries over unchanged and the progressive decode path
    * must land on the identical hash).
    * Expected pairs: the six in-quartet pairs per doc at hamming 0 —
    * any decoder drift (quantization, IDCT rounding, block placement,
    * EOBRUN bookkeeping, luma crop) flips a gradient sign somewhere
    * across the ~600-doc × 72-cell population and breaks the
    * arithmetic oracle. */
  def q110JpegNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.parallel(s, dir, "documents")
    val media = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id0, text) =>
        val id = Round9.guardMediaId(id0)
        def px(shift: Int)(x: Int, y: Int): Int =
          Round9.cellValue(id, (y / 8) * 9 + x / 8) + shift
        Seq(
          Multimodal.MediaRecord(id, "image",
            ImageDedup.ImageBuild.bmp24Gray(72, 64)(px(0))),
          Multimodal.MediaRecord(id + 1000000L, "image",
            JpegBuild.gray(72, 64)(px(0))),
          Multimodal.MediaRecord(id + 2000000L, "image",
            JpegBuild.gray(72, 64)(px(16))),
          Multimodal.MediaRecord(id + 3000000L, "image",
            text.getBytes("UTF-8")),
          Multimodal.MediaRecord(id + 4000000L, "image",
            JpegBuild.grayProgressive(72, 64)(px(0))))
      }
      .toDF("media_id", "kind", "payload")
    ImageDedup.nearDupPairs(media, "media_id", "payload",
        maxHamming = 3, bands = 4)
      .orderBy("id_a", "id_b")
  }

  /** q111: CROSS-CONTAINER video near-dup — the same clip rendered as
    * an animated GIF and as MJPEG-AVI ([[graft.operators.MotionJpeg]],
    * r11) must fingerprint identically under BOTH hash forms. The
    * plant reuses q110's provable-exactness discipline: 72×64 frames
    * constant within each 8×8 block, encoded with the all-ones quant
    * table, so the JPEG frames decode bit-exactly to the GIF's gray
    * values and the oracle is arithmetic, not tolerance-based.
    * Populations per doc_id: the 5-frame GIF (base); the MJPEG-AVI of
    * the same frames (+1M, custom per-frame DHT); the SAME AVI with
    * DHT-LESS standard-table frames (+2M — the de-facto MJPEG wire
    * shape, exercising the Annex-K implied-table path end to end);
    * opaque text (+3M); and the AVI with the frame ORDER REVERSED
    * (+4M).
    * Expected (arithmetic):
    *  - form='mean': all six pairs among {0,+1M,+2M,+4M} at hamming 0
    *    (the temporal mean is frame-order-insensitive);
    *  - form='ordered': exactly the three pairs among {0,+1M,+2M} at
    *    jaccard 1 — the reversed cut shares no positional 2-gram.
    * Any drift between the GIF compositor and the per-frame JPEG
    * decode (or a wrong Annex-K constant) breaks a pair somewhere
    * across the ~500-doc × 72-cell population. */
  def q111CrossContainerVideo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.MotionJpeg
    val docs = Tables.parallel(s, dir, "documents")
    val media = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id0, text) =>
        val id = Round9.guardMediaId(id0)
        def px(f: Int)(x: Int, y: Int): Int =
          Round9.videoCell(id, f, (y / 8) * 9 + x / 8)
        def jpegs(order: Seq[Int], std: Boolean): Seq[Array[Byte]] =
          order.map(f => JpegBuild.gray(72, 64, standardTables = std,
            writeDht = !std)(px(f)))
        Seq(
          Multimodal.MediaRecord(id, "video",
            VideoDedup.GifBuild.animatedGray(72, 64,
              (0 until 5).map(px))),
          Multimodal.MediaRecord(id + 1000000L, "video",
            MotionJpeg.AviBuild.mjpeg(72, 64,
              jpegs(0 until 5, std = false))),
          Multimodal.MediaRecord(id + 2000000L, "video",
            MotionJpeg.AviBuild.mjpeg(72, 64,
              jpegs(0 until 5, std = true))),
          Multimodal.MediaRecord(id + 3000000L, "video",
            text.getBytes("UTF-8")),
          Multimodal.MediaRecord(id + 4000000L, "video",
            MotionJpeg.AviBuild.mjpeg(72, 64,
              jpegs((0 until 5).reverse, std = false))))
      }
      .toDF("media_id", "kind", "payload")
      // Pin the plant: unlike q108 (where a pin measured as a wash —
      // GIF builds are cheap), q111's plant runs 15 JPEG FDCT encodes
      // per doc, and BOTH hash-form branches below re-evaluate the
      // flatMap without it. MATERIALIZES EAGERLY at call time (the
      // PLANS.md "Eager materialization points" contract, same as
      // orderedNearDupPairs' gram table).
      .localCheckpoint()
    val mean = VideoDedup
      .nearDupPairs(media, "media_id", "payload", maxHamming = 3, bands = 4)
      .select(col("id_a"), col("id_b"), lit("mean").as("form"),
        col("hamming").cast("double").as("score"))
    val ordered = VideoDedup
      .orderedNearDupPairs(media, "media_id", "payload",
        q = 2, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), lit("ordered").as("form"),
        col("jaccard").as("score"))
    mean.unionByName(ordered).orderBy("form", "id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_video_ordered" -> q108VideoOrdered _,
    "q109_media_reason_census" -> q109MediaReasonCensus _,
    "q110_jpeg_neardup" -> q110JpegNearDup _,
    "q111_cross_container_video" -> q111CrossContainerVideo _)

  val oracles: Map[String, String] = Map(
    "q108_video_ordered" ->
      """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
        |m(a_k, b_k) AS (VALUES (0, 1000000), (0, 2000000),
        |                       (1000000, 2000000))
        |SELECT t.id + m.a_k AS id_a, t.id + m.b_k AS id_b,
        |  'mean' AS form, CAST(0 AS DOUBLE) AS score
        |FROM t, m
        |UNION ALL
        |SELECT id, id + 2000000, 'ordered', CAST(1 AS DOUBLE) FROM t
        |ORDER BY form, id_a, id_b""".stripMargin,
    "q109_media_reason_census" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
        |v(variant, reason) AS (VALUES
        |  ('bmp', 'ok'), ('bmp_8bpp', 'unsupported'),
        |  ('bmp_trunc', 'corrupt'), ('gif', 'ok'),
        |  ('jpeg_12bit', 'unsupported'), ('jpeg_base', 'ok'),
        |  ('jpeg_hdr', 'corrupt'), ('jpeg_prog', 'ok'),
        |  ('missing', 'missing'), ('no_magic', 'opaque'),
        |  ('png_gray16', 'ok'), ('png_gray8', 'ok'),
        |  ('png_huge', 'oversized'), ('png_palette_adam7', 'ok'),
        |  ('wav', 'ok'), ('wav_float', 'unsupported'),
        |  ('wav_pcm8', 'ok'), ('wav_f64', 'ok'),
        |  ('wav_ulaw', 'ok'), ('wav_alaw', 'ok'),
        |  ('wav_ext', 'ok'), ('wav_adpcm', 'unsupported'),
        |  ('wav_ext_guid', 'unsupported'), ('wav_ext_short', 'corrupt'),
        |  ('avi_mjpeg', 'ok'), ('avi_nodht', 'ok'),
        |  ('avi_xvid', 'unsupported'), ('avi_trunc', 'corrupt'),
        |  ('wav_ima', 'ok'), ('aiff', 'ok'), ('aiff_trunc', 'corrupt'),
        |  ('au_ulaw', 'ok'), ('au_g721', 'unsupported'),
        |  ('wav_ms', 'ok'), ('tiff_gray', 'ok'), ('tiff_packbits', 'ok'),
        |  ('tiff_lzw', 'ok'), ('tiff_trunc', 'corrupt'),
        |  ('tiff_deflate', 'ok'), ('tiff_ycbcr', 'unsupported'))
        |SELECT v.variant, v.reason, n.c AS cnt FROM v, n
        |ORDER BY variant, reason""".stripMargin,
    "q110_jpeg_neardup" ->
      """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
        |m(a_k, b_k) AS (VALUES (0, 1000000), (0, 2000000),
        |                       (0, 4000000), (1000000, 2000000),
        |                       (1000000, 4000000), (2000000, 4000000))
        |SELECT t.id + m.a_k AS id_a, t.id + m.b_k AS id_b,
        |  CAST(0 AS INTEGER) AS hamming
        |FROM t, m
        |ORDER BY id_a, id_b""".stripMargin,
    "q111_cross_container_video" ->
      """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
        |mm(a_k, b_k) AS (VALUES (0, 1000000), (0, 2000000),
        |                        (0, 4000000), (1000000, 2000000),
        |                        (1000000, 4000000), (2000000, 4000000)),
        |mo(a_k, b_k) AS (VALUES (0, 1000000), (0, 2000000),
        |                        (1000000, 2000000))
        |SELECT t.id + mm.a_k AS id_a, t.id + mm.b_k AS id_b,
        |  'mean' AS form, CAST(0 AS DOUBLE) AS score
        |FROM t, mm
        |UNION ALL
        |SELECT t.id + mo.a_k, t.id + mo.b_k, 'ordered', CAST(1 AS DOUBLE)
        |FROM t, mo
        |ORDER BY form, id_a, id_b""".stripMargin)
}
