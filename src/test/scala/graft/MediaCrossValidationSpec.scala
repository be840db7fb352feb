package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}
import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioDedup, ImageDedup, VideoDedup}
import graft.operators.ImageDedup.{ImageBuild, ImagePixels}

/** Independent-conformance pins for the from-scratch PNG / GIF / BMP /
  * WAV decoders and builders: until r11 they were verified only
  * against EACH OTHER (builder → decoder roundtrips, BMP↔PNG parity).
  * The JDK's ImageIO / javax.sound codecs are third-party
  * implementations of the same public formats — agreement in both
  * directions (our bytes read correctly there, their bytes read
  * correctly here) rules out a mirrored builder/decoder bug that
  * self-roundtrips could hide. Test-only: the library never touches
  * ImageIO/AudioSystem. */
class MediaCrossValidationSpec extends AnyFunSuite {

  private def luma(rgb: Int): Int =
    (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
      29 * (rgb & 0xff)) >> 8

  private def imageIoPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val bi = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(bi != null, "ImageIO could not parse the payload")
    val w = bi.getWidth; val h = bi.getHeight
    val cm = bi.getColorModel
    // grayscale rasters must be read raw: getRGB would push linear
    // gray through the CS_GRAY→sRGB gamma curve (60 → 133), which is a
    // display conversion, not the sample value either decoder stores.
    // Indexed models (GIF/palette PNG) resolve through the palette.
    val grayRaster = cm.getNumColorComponents == 1 &&
      !cm.isInstanceOf[java.awt.image.IndexColorModel]
    val out =
      if (grayRaster) {
        val bits = cm.getComponentSize(0)
        val maxV = (1 << bits) - 1
        Array.tabulate(h, w)((y, x) =>
          bi.getRaster.getSample(x, y, 0) * 255 / maxV)
      } else Array.tabulate(h, w)((y, x) => luma(bi.getRGB(x, y)))
    (w, h, out.flatten)
  }

  private def encodeVia(bi: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(bi, format, bos), s"no $format writer")
    bos.toByteArray
  }

  // ---- PNG ----------------------------------------------------------

  test("our PNG encodes decode identically in ImageIO across the " +
      "static matrix (color types, depths, Adam7, filters)") {
    val rnd = new scala.util.Random(0xc401)
    val img = Array.fill(16, 18)(rnd.nextInt(256))
    val cases = Seq(
      (0, 8, false), (0, 8, true), (2, 8, false), (4, 8, false),
      (6, 8, true), (0, 16, false), (2, 16, true),
      (3, 8, false), (3, 4, true), (0, 4, false), (0, 1, true))
    for ((ct, depth, inter) <- cases) {
      val maxV = if (depth >= 8) 255 else (1 << depth) - 1
      val bytes = ImageBuild.pngGray(18, 16, colorType = ct, depth = depth,
        interlace = inter, filterOf = y => y % 5)(
        (x, y) => img(y)(x) % (maxV + 1))
      val Some((w, h, ours)) = ImagePixels.decodeGray(bytes)
      val (iw, ih, theirs) = imageIoPixels(bytes)
      assert((w, h) === ((iw, ih)), s"ct=$ct d=$depth i=$inter")
      // 8-bit exact; 16-bit we take the high byte while ImageIO's
      // 8-bit view may round; sub-byte scale arithmetic may differ by
      // one rounding step
      val tol = if (depth == 8) 0 else 1
      val worst = ours.lazyZip(theirs).map((a, b) => math.abs(a - b)).max
      assert(worst <= tol, s"ct=$ct d=$depth i=$inter worst=$worst")
    }
  }

  test("ImageIO-encoded PNGs (gray + RGB) decode exactly in our decoder") {
    val rnd = new scala.util.Random(0xc402)
    val w = 23; val h = 14
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      rgb.setRGB(x, y, rnd.nextInt(1 << 24))
    for (bi <- Seq(gray, rgb)) {
      val bytes = encodeVia(bi, "png")
      val Some((dw, dh, ours)) = ImagePixels.decodeGray(bytes)
      val (iw, ih, theirs) = imageIoPixels(bytes)
      assert((dw, dh) === ((iw, ih)))
      assert(ours.toSeq === theirs.toSeq) // PNG is lossless: exact
    }
  }

  // ---- BMP ----------------------------------------------------------

  test("ImageIO-encoded 24-bit BMPs decode exactly in our decoder") {
    val rnd = new scala.util.Random(0xc403)
    val w = 21; val h = 9 // odd width: stride padding must agree
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, rnd.nextInt(1 << 24))
    val bytes = encodeVia(bi, "bmp")
    val Some((dw, dh, ours)) = ImagePixels.decodeGray(bytes)
    val (iw, ih, theirs) = imageIoPixels(bytes)
    assert((dw, dh) === ((iw, ih)))
    assert(ours.toSeq === theirs.toSeq)
  }

  test("our BMP encodes decode identically in ImageIO") {
    val rnd = new scala.util.Random(0xc404)
    val img = Array.fill(16, 18)(rnd.nextInt(256))
    for (topDown <- Seq(false, true)) {
      val bytes = ImageBuild.bmp24Gray(18, 16, topDown)((x, y) => img(y)(x))
      val Some((_, _, ours)) = ImagePixels.decodeGray(bytes)
      val (iw, ih, theirs) = imageIoPixels(bytes)
      assert((iw, ih) === ((18, 16)), s"topDown=$topDown")
      assert(ours.toSeq === theirs.toSeq, s"topDown=$topDown")
    }
  }

  // ---- GIF ----------------------------------------------------------

  test("our animated GIFs decode frame-identically in ImageIO " +
      "(full-canvas frames incl. an interlaced one)") {
    val rnd = new scala.util.Random(0xc405)
    val frames = Seq.tabulate(3)(f =>
      Array.fill(16, 18)(rnd.nextInt(256)): Array[Array[Int]])
    val bytes = VideoDedup.GifBuild.animatedFrames(18, 16,
      frames.zipWithIndex.map { case (fr, i) =>
        VideoDedup.GifBuild.FrameSpec(0, 0, 18, 16,
          (x, y) => fr(y)(x), interlaced = i == 1)
      })
    val Some(ourFrames) = VideoDedup.GifPixels.decodeFrames(bytes)
    assert(ourFrames.size === 3)
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(ImageIO.createImageInputStream(
      new ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) === 3)
    for (i <- 0 until 3) {
      val bi = reader.read(i)
      assert((bi.getWidth, bi.getHeight) === ((18, 16)), s"frame $i")
      for (y <- 0 until 16; x <- 0 until 18)
        assert(ourFrames(i).luma(y * 18 + x) === luma(bi.getRGB(x, y)),
          s"frame $i ($x,$y)")
    }
    reader.dispose()
  }

  test("an ImageIO-encoded GIF decodes exactly in our decoder") {
    val rnd = new scala.util.Random(0xc406)
    // gray values fit a 256-entry palette exactly: no quantization
    val bi = new BufferedImage(18, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 18)
      bi.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val bytes = encodeVia(bi, "gif")
    val Some(frames) = VideoDedup.GifPixels.decodeFrames(bytes)
    assert(frames.size === 1)
    val (iw, ih, theirs) = imageIoPixels(bytes)
    assert((frames.head.w, frames.head.h) === ((iw, ih)))
    assert(frames.head.luma.toSeq === theirs.toSeq)
  }

  // ---- WAV ----------------------------------------------------------

  test("a javax.sound-written PCM16 WAV decodes to the same samples " +
      "and energy hash as our builder's bytes") {
    val rnd = new scala.util.Random(0xc407)
    val samples = Array.fill(520)(rnd.nextInt(65536) - 32768)
    // little-endian signed PCM16 mono, the format our builder writes
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(raw), fmt,
        samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val theirs = bos.toByteArray
    val Some(decoded) = AudioDedup.WavPcm.decodeSamples(theirs)
    assert(decoded.toSeq === samples.toSeq)
    val ourBytes = AudioDedup.WavBuild.pcm16(samples)
    assert(AudioDedup.WavPcm.hashOf(theirs) ===
      AudioDedup.WavPcm.hashOf(ourBytes))
  }

  test("javax.sound-written AIFF (BE PCM16) and AU (BE PCM16 + ULAW) " +
      "decode to the same samples as our builders' bytes") {
    val rnd = new scala.util.Random(0xc712)
    val samples = Array.fill(520)(rnd.nextInt(65536) - 32768)
    val bePcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      bePcm(2 * i) = ((samples(i) >> 8) & 0xff).toByte
      bePcm(2 * i + 1) = (samples(i) & 0xff).toByte
    }
    val beFmt = new AudioFormat(8000f, 16, 1, true, true) // big-endian
    def written(tpe: AudioFileFormat.Type, fmt: AudioFormat,
        raw: Array[Byte], frames: Long): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(raw), fmt, frames), tpe, bos)
      bos.toByteArray
    }
    val theirAiff = written(AudioFileFormat.Type.AIFF, beFmt, bePcm,
      samples.length.toLong)
    assert(AudioDedup.AiffPcm.decodeSamples(theirAiff).map(_.toSeq) ===
      Some(samples.toSeq))
    assert(AudioDedup.hashOfAny(theirAiff) ===
      AudioDedup.hashOfAny(AudioDedup.AiffBuild.pcm16(samples)))
    val theirAu = written(AudioFileFormat.Type.AU, beFmt, bePcm,
      samples.length.toLong)
    assert(AudioDedup.AuPcm.decodeSamples(theirAu).map(_.toSeq) ===
      Some(samples.toSeq))
    // a JDK-written ULAW .au decodes through our µ-law table
    val codes = Array.fill(520)(rnd.nextInt(256).toByte)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val theirUlawAu = written(AudioFileFormat.Type.AU, ulawFmt, codes,
      codes.length.toLong)
    assert(AudioDedup.AuPcm.decodeSamples(theirUlawAu).map(_.toSeq) ===
      AudioDedup.AuPcm.decodeSamples(
        AudioDedup.AuBuild.build(1, codes)).map(_.toSeq))
    assert(AudioDedup.AuPcm.decodeSamples(theirUlawAu).nonEmpty)
  }

  test("G.711 expansion matches the JDK codec on every code, both laws") {
    val codes = Array.tabulate(256)(_.toByte)
    for (alaw <- Seq(false, true)) {
      val enc = if (alaw) AudioFormat.Encoding.ALAW
                else AudioFormat.Encoding.ULAW
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val pcm = AudioSystem.getAudioInputStream(dst,
        new AudioInputStream(new ByteArrayInputStream(codes), src, 256L))
      val out = pcm.readAllBytes()
      val jdk = Array.tabulate(256)(i =>
        ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt)
      val ours = AudioDedup.WavPcm.decodeSamples(
        AudioDedup.WavBuild.g711(codes, alaw)).get
      assert(ours.toSeq === jdk.toSeq,
        s"alaw=$alaw: CCITT expansion disagrees with the JDK codec")
    }
  }

  test("a javax.sound-written ULAW WAV decodes through our container walk") {
    val rnd = new scala.util.Random(0xc711)
    val codes = Array.fill(520)(rnd.nextInt(256).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(codes), fmt,
        codes.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val theirs = bos.toByteArray
    val ours = AudioDedup.WavBuild.g711(codes, alaw = false)
    assert(AudioDedup.WavPcm.decodeSamples(theirs).map(_.toSeq) ===
      AudioDedup.WavPcm.decodeSamples(ours).map(_.toSeq))
    assert(AudioDedup.WavPcm.decodeSamples(theirs).nonEmpty)
  }
}
