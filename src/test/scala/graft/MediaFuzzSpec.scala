package graft

import graft.operators.{AudioDedup, ImageDedup, JpegBuild, VideoDedup}

/** Fuzz pin for the media-decoder family's never-throw contract: at
  * 100 TB a corrupt payload WILL occur, and the documented behavior is
  * None/skip — any exception from random garbage, truncations, or
  * byte-flips of valid payloads is a job-killing bug (the r9 review
  * found two such overflow paths; this keeps the class closed). */
class MediaFuzzSpec extends SparkSuite {

  /** Iteration multiplier for one-off endurance runs
    * (`GRAFT_FUZZ_MULT=20 sbt "testOnly graft.MediaFuzzSpec"`);
    * default 1 keeps the suite fast. The rnd seed is fixed, so a
    * failure found at a higher multiplier reproduces at it. */
  private val Mult =
    math.max(1, sys.env.getOrElse("GRAFT_FUZZ_MULT", "1").toInt)

  private val rnd = new scala.util.Random(0xf022)

  private def decodeAll(p: Array[Byte]): Unit = {
    ImageDedup.ImagePixels.dhashOf(p)
    ImageDedup.ImagePixels.ahashOf(p)
    ImageDedup.ImagePixels.decodeGrayReason(p)
    AudioDedup.WavPcm.hashOf(p)
    AudioDedup.hashOfAny(p) // container dispatch incl. AIFF/AU
    AudioDedup.AiffPcm.decodeReason(p)
    AudioDedup.AuPcm.decodeReason(p)
    VideoDedup.GifPixels.avgHashOf(p)
    VideoDedup.GifPixels.frameHashesOf(p)
    VideoDedup.GifPixels.decodeReason(p)
    VideoDedup.avgHashOf(p) // container dispatch incl. MJPEG-AVI
    VideoDedup.frameHashesOf(p)
    graft.operators.MotionJpeg.AviPixels.decodeReason(p)
    ()
  }

  private def validPayloads(): Seq[Array[Byte]] = {
    val img = Array.fill(16, 18)(1 + rnd.nextInt(200))
    val bmp = ImageDedup.ImageBuild.bmp24Gray(18, 16)((x, y) => img(y)(x))
    val wav = AudioDedup.WavBuild.pcm16(
      Array.fill(520)(rnd.nextInt(65536) - 32768))
    val gif = VideoDedup.GifBuild.animatedGray(18, 16,
      Seq.fill(3)((x: Int, y: Int) => img(y)(x)))
    // PNG with all channels + all filters and a delta/disposal/
    // transparency/interlace GIF: the r10 decode surfaces fuzz too
    val png = ImageDedup.ImageBuild.pngGray(18, 16,
      colorType = Seq(0, 2, 4, 6)(rnd.nextInt(4)),
      filterOf = y => y % 5)((x, y) => img(y)(x))
    // r11 decode surfaces: palette (PLTE walk + index clamp), 16-bit,
    // sub-byte packing, Adam7 pass geometry
    val pngPal = ImageDedup.ImageBuild.pngGray(18, 16, colorType = 3,
      depth = Seq(1, 2, 4, 8)(rnd.nextInt(4)),
      filterOf = y => y % 5)((x, y) => img(y)(x) % 16)
    val pngAdam = ImageDedup.ImageBuild.pngGray(18, 16, colorType = 2,
      depth = 16, interlace = true,
      filterOf = y => y % 5)((x, y) => img(y)(x))
    val deltaGif = VideoDedup.GifBuild.animatedFrames(18, 16, Seq(
      VideoDedup.GifBuild.FrameSpec(0, 0, 18, 16,
        (x, y) => img(y)(x), disposal = 3),
      VideoDedup.GifBuild.FrameSpec(2, 3, 7, 5,
        (_, _) => rnd.nextInt(256), disposal = 2, transIdx = 5),
      VideoDedup.GifBuild.FrameSpec(0, 0, 18, 16,
        (x, y) => img(y)(x), interlaced = true)))
    // r11 decode surface: baseline JPEG — unit and lossy quant, with
    // restart markers (the bit-reader's marker latch fuzzes too)
    val jpg = JpegBuild.gray(18, 16)((x, y) => img(y)(x))
    val jpgRst = JpegBuild.gray(18, 16, quant = JpegBuild.LossyQuant,
      restartInterval = 2)((x, y) => img(y)(x))
    val jpgProg = JpegBuild.grayProgressive(18, 16,
      quant = JpegBuild.LossyQuant)((x, y) => img(y)(x))
    // r11 WAV-scope surfaces: every widened format's chunk/fmt walk
    val wavF32 = AudioDedup.WavBuild.float32(
      Array.fill(520)(rnd.nextFloat() * 2f - 1f))
    val wavP24 = AudioDedup.WavBuild.pcm(
      Array.fill(520)(rnd.nextInt(1 << 24) - (1 << 23)), bits = 24)
    val wavUlaw = AudioDedup.WavBuild.g711(
      Array.fill(520)(rnd.nextInt(256).toByte), alaw = false)
    val wavExt = AudioDedup.WavBuild.extensiblePcm16(
      Array.fill(520)(rnd.nextInt(65536) - 32768), channels = 2,
      channelMask = 3)
    val wavIma = AudioDedup.WavBuild.imaAdpcmMono(Seq.fill(2)((
      rnd.nextInt(65536) - 32768, rnd.nextInt(89),
      Array.fill(32)(rnd.nextInt(256).toByte))))
    val wavMs = AudioDedup.WavBuild.msAdpcmMono(Seq.fill(2)((
      rnd.nextInt(7), rnd.nextInt(65536) - 32768,
      rnd.nextInt(65536) - 32768, rnd.nextInt(65536) - 32768,
      Array.fill(32)(rnd.nextInt(256).toByte))))
    // r11 audio containers: AIFF (big-endian IFF walk) and Sun .au
    val aiff = AudioDedup.AiffBuild.pcm16(
      Array.fill(520)(rnd.nextInt(65536) - 32768))
    val au = AudioDedup.AuBuild.build(
      Seq(1, 2, 3, 27)(rnd.nextInt(4)),
      Array.fill(520)(rnd.nextInt(256).toByte))
    // r11 image container: baseline TIFF (IFD walk, strips, PackBits)
    val tiff = graft.operators.TiffPixels.TiffBuild.build(18, 16,
      bits = Seq(1, 4, 8, 16)(rnd.nextInt(4)),
      photometric = rnd.nextInt(2), le = rnd.nextBoolean(),
      compression = Seq(1, 5, 8, 32773)(rnd.nextInt(4)),
      rowsPerStrip = 1 + rnd.nextInt(16))(
      (x, y) => img(y)(x) % 2) // in-range for every bit depth
    // r12: predictor-2 + FillOrder-2 shapes (8/16-bit only — the
    // builder refuses sub-byte differencing like the decoder does)
    val tiffP2 = graft.operators.TiffPixels.TiffBuild.build(18, 16,
      bits = Seq(8, 16)(rnd.nextInt(2)),
      le = rnd.nextBoolean(),
      compression = Seq(1, 5, 8, 32773)(rnd.nextInt(4)),
      rowsPerStrip = 1 + rnd.nextInt(16),
      predictor = 2, fillOrder = 1 + rnd.nextInt(2))(
      (x, y) => img(y)(x))
    // r11 video surface: MJPEG-AVI (RIFF walk, per-frame JPEG decode,
    // DHT-less frames, dropped-frame repeats, rec grouping)
    val avi = graft.operators.MotionJpeg.AviBuild.mjpeg(18, 16, Seq(
      JpegBuild.gray(18, 16)((x, y) => img(y)(x)),
      Array.emptyByteArray,
      JpegBuild.gray(18, 16, standardTables = true,
        writeDht = false)((x, y) => img(y)(x))),
      recWrap = rnd.nextBoolean())
    // r12 image container: VP8L lossless WEBP (bit-stream Huffman,
    // transforms, LZ77, cache — randomized dials; r13 adds the
    // meta-Huffman indirection, cross-color, and sentinel modes)
    val palettedWebp = rnd.nextBoolean()
    // r14: palette composes with ONE of SG / predictor (both width
    // regimes fuzzed)
    val palCompanion = if (palettedWebp) rnd.nextInt(3) else -1
    val webp = graft.operators.WebpPixels.WebpBuild.vp8lGray(18, 16,
      subtractGreen =
        if (palettedWebp) palCompanion == 1 else rnd.nextBoolean(),
      predictorMode =
        if (palettedWebp) (if (palCompanion == 2) rnd.nextInt(16) else -1)
        else rnd.nextInt(17) - 1, // -1..15
      paletted = palettedWebp,
      backrefs = rnd.nextBoolean(),
      cacheBits = rnd.nextInt(7), // 0 = off
      mapDistances = rnd.nextBoolean(),
      crossColor = !palettedWebp && rnd.nextBoolean(),
      metaGroups = if (palettedWebp) 1 else 1 + rnd.nextInt(3),
      metaBits = 2)(
      (x, y) => img(y)(x) % (if (palettedWebp) 16 else 256))
    // r13: the VP8X extended wrapper (metadata walk + canvas check)
    val webpX = graft.operators.WebpPixels.WebpBuild.vp8x(
      graft.operators.WebpPixels.WebpBuild.vp8lGray(18, 16,
        subtractGreen = rnd.nextBoolean())((x, y) => img(y)(x)),
      anim = rnd.nextInt(4) == 0)
    Seq(bmp, wav, gif, png, pngPal, pngAdam, deltaGif, jpg, jpgRst,
      jpgProg, wavF32, wavP24, wavUlaw, wavExt, wavIma, wavMs, avi,
      aiff, au, tiff, tiffP2, webp, webpX)
  }

  test("pure random garbage never throws (1000 payloads)") {
    for (_ <- 1 to 1000 * Mult) {
      val p = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(p)
      decodeAll(p)
    }
  }

  test("garbage behind valid magic bytes never throws") {
    val magics = Seq("BM", "RIFF", "GIF89a", "GIF87a",
      "FORMxxxxAIFF", "FORMxxxxAIFC", ".snd").map(
      _.getBytes("US-ASCII")) :+
      Array[Byte]('I', 'I', 42, 0) :+ // TIFF little-endian
      Array[Byte]('M', 'M', 0, 42) :+ // TIFF big-endian
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte) :+ // JPEG SOI
      ("RIFF".getBytes("US-ASCII") ++
        Array[Byte](-16, 0, 0, 0) ++ // declared size 240: an AVI shell
        "AVI ".getBytes("US-ASCII")) :+
      ("RIFF".getBytes("US-ASCII") ++
        Array[Byte](-16, 0, 0, 0) ++ // a WEBP shell (r12: VP8L walk)
        "WEBP".getBytes("US-ASCII"))
    for (_ <- 1 to 500 * Mult; m <- magics) {
      val tail = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(tail)
      decodeAll(m ++ tail)
    }
  }

  test("every truncation of a valid payload never throws") {
    validPayloads().foreach { p =>
      var n = 0
      while (n < p.length) {
        decodeAll(p.take(n))
        n += 1
      }
    }
  }

  test("single-byte mutations of valid payloads never throw") {
    (1 to Mult).foreach { _ =>
    validPayloads().foreach { p =>
      for (_ <- 1 to 400) {
        val m = p.clone
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        decodeAll(m)
      }
    }
    }
  }

  test("multi-byte header stomps of valid payloads never throw") {
    (1 to Mult).foreach { _ =>
    validPayloads().foreach { p =>
      for (_ <- 1 to 300) {
        val m = p.clone
        val n = 1 + rnd.nextInt(8)
        for (_ <- 0 until n)
          m(rnd.nextInt(math.min(m.length, 64))) = rnd.nextInt(256).toByte
        decodeAll(m)
      }
    }
    }
  }
}
