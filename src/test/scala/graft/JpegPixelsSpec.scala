package graft

import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JpegBuild, JpegPixels, Multimodal}
import graft.operators.ImageDedup.{ImageBuild, ImagePixels}

/** From-scratch baseline-JPEG decoder ([[JpegPixels]]) + encoder
  * ([[JpegBuild]]) conformance. The JDK's ImageIO JPEG codec serves as
  * an INDEPENDENT test-only oracle in both directions — our bytes must
  * decode correctly in a canonical third-party reader, and canonical
  * third-party bytes (incl. YCbCr 4:2:0 multi-component scans our
  * encoder never produces) must decode correctly in our reader. The
  * library itself never touches ImageIO. */
class JpegPixelsSpec extends AnyFunSuite {

  private def randImg(rnd: scala.util.Random, w: Int, h: Int)
      : Array[Array[Int]] = Array.fill(h, w)(rnd.nextInt(256))

  private def decodeOrFail(p: Array[Byte]): (Int, Int, Array[Int]) =
    JpegPixels.decodeGray(p) match {
      case Right(t) => t
      case Left(r) => fail(s"decode rejected: $r")
    }

  private def maxDiff(a: Array[Int], b: Array[Int]): Int = {
    assert(a.length === b.length)
    a.lazyZip(b).map((x, y) => math.abs(x - y)).max
  }

  // ---- ImageIO oracle helpers (test-only) ---------------------------

  private def imageIoBytes(bi: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(bi, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def grayImage(img: Array[Array[Int]]): BufferedImage = {
    val h = img.length; val w = img(0).length
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, img(y)(x))
    bi
  }

  private def imageIoGray(p: Array[Byte]): (Int, Int, Array[Int]) = {
    val bi = ImageIO.read(new java.io.ByteArrayInputStream(p))
    assert(bi != null, "ImageIO could not parse our encoder's output")
    val w = bi.getWidth; val h = bi.getHeight
    val out = new Array[Int](w * h)
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    gray.getGraphics.drawImage(bi, 0, 0, null)
    for (y <- 0 until h; x <- 0 until w)
      out(y * w + x) = gray.getRaster.getSample(x, y, 0)
    (w, h, out)
  }

  // ---- exactness: the q110 foundation -------------------------------

  test("unit-quant constant blocks roundtrip EXACTLY for every v in 0..255") {
    // one 8x8 block per value — DC-only blocks must reproduce v bit-exactly
    for (group <- 0 until 4) {
      val vals = (group * 64 until (group + 1) * 64).toArray
      // 64 blocks in an 8x8 block grid (64x64 px)
      val p = JpegBuild.gray(64, 64)((x, y) => vals((y / 8) * 8 + x / 8))
      val (w, h, pix) = decodeOrFail(p)
      assert((w, h) === ((64, 64)))
      for (y <- 0 until 64; x <- 0 until 64)
        assert(pix(y * 64 + x) === vals((y / 8) * 8 + x / 8),
          s"block value ${vals((y / 8) * 8 + x / 8)} at ($x,$y)")
    }
  }

  test("unit-quant constant blocks: dHash identical to the BMP twin, " +
      "+16 brightness dHash-invariant (the q110 plant contract)") {
    val rnd = new scala.util.Random(110)
    for (_ <- 0 until 20) {
      val cells = Array.fill(8, 9)(1 + rnd.nextInt(200))
      def px(shift: Int)(x: Int, y: Int): Int = cells(y / 8)(x / 8) + shift
      val bmp = ImageBuild.bmp24Gray(72, 64)(px(0))
      val jpg = JpegBuild.gray(72, 64)(px(0))
      val jpgBright = JpegBuild.gray(72, 64)(px(16))
      val hs = Seq(bmp, jpg, jpgBright).map(b =>
        ImagePixels.dhashOf(b).getOrElse(fail("no hash")))
      assert(hs(0) === hs(1), "JPEG twin dHash differs from BMP")
      assert(hs(0) === hs(2), "brightness shift changed the dHash")
    }
  }

  test("unit-quant arbitrary images roundtrip within DCT rounding (<=2)") {
    val rnd = new scala.util.Random(1)
    for ((w, h) <- Seq((24, 16), (17, 9), (8, 8), (1, 1), (3, 20))) {
      val img = randImg(rnd, w, h)
      val (dw, dh, pix) = decodeOrFail(
        JpegBuild.gray(w, h)((x, y) => img(y)(x)))
      assert((dw, dh) === ((w, h)))
      val orig = (0 until h).flatMap(y => img(y).toSeq).toArray
      assert(maxDiff(pix, orig) <= 2, s"${w}x$h")
    }
  }

  test("lossy quant roundtrip stays within the table's error band") {
    val rnd = new scala.util.Random(2)
    // smooth image: error bounded ~ sum(q)/something; pin an empirical band
    val img = Array.tabulate(40, 48)((y, x) =>
      128 + (40 * math.sin(x / 7.0) + 30 * math.cos(y / 5.0)).toInt +
        rnd.nextInt(5))
    val p = JpegBuild.gray(48, 40, quant = JpegBuild.LossyQuant)(
      (x, y) => math.min(255, math.max(0, img(y)(x))))
    val (w, h, pix) = decodeOrFail(p)
    assert((w, h) === ((48, 40)))
    val orig = (0 until h).flatMap(y =>
      img(y).map(v => math.min(255, math.max(0, v)))).toArray
    assert(maxDiff(pix, orig) <= 20)
  }

  test("restart intervals: DRI/RSTn decode equals the marker-free encode") {
    val rnd = new scala.util.Random(3)
    val img = randImg(rnd, 33, 18) // 5x3 blocks → RSTs mid-row and mid-image
    val plain = decodeOrFail(JpegBuild.gray(33, 18)((x, y) => img(y)(x)))._3
    for (ri <- Seq(1, 2, 7)) {
      val withRst = decodeOrFail(
        JpegBuild.gray(33, 18, restartInterval = ri)((x, y) => img(y)(x)))._3
      assert(plain.toSeq === withRst.toSeq, s"restartInterval=$ri")
    }
  }

  test("a broken RSTn sequence number is corrupt, not garbage pixels") {
    val img = Array.tabulate(24, 24)((y, x) => (x * 10 + y * 3) % 256)
    val p = JpegBuild.gray(24, 24, restartInterval = 1)((x, y) => img(y)(x))
    // find the first RST (FF D0) in the scan and bump its sequence
    var i = 2
    var patched = false
    while (!patched && i + 1 < p.length) {
      if ((p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == 0xd0) {
        p(i + 1) = 0xd4.toByte; patched = true
      }
      i += 1
    }
    assert(patched)
    assert(JpegPixels.decodeGray(p) === Left("corrupt"))
  }

  // ---- cross-validation against the ImageIO oracle ------------------

  test("our encoder's bytes decode in ImageIO to the same pixels we decode") {
    val rnd = new scala.util.Random(4)
    for ((w, h, q) <- Seq((32, 24, JpegBuild.UnitQuant),
        (21, 13, JpegBuild.LossyQuant))) {
      val img = randImg(rnd, w, h)
      val bytes = JpegBuild.gray(w, h, quant = q)((x, y) => img(y)(x))
      val (dw, dh, ours) = decodeOrFail(bytes)
      val (iw, ih, theirs) = imageIoGray(bytes)
      assert((dw, dh) === ((iw, ih)))
      // two conformant IDCTs may differ by the T.83 ±1 class
      assert(maxDiff(ours, theirs) <= 1, s"${w}x$h")
    }
  }

  test("ImageIO-encoded grayscale decodes to ImageIO's own pixels (±1)") {
    val rnd = new scala.util.Random(5)
    for (quality <- Seq(0.95f, 0.7f)) {
      val img = randImg(rnd, 40, 28)
      val bytes = imageIoBytes(grayImage(img), quality)
      val (w, h, ours) = decodeOrFail(bytes)
      val (iw, ih, theirs) = imageIoGray(bytes)
      assert((w, h) === ((iw, ih)))
      assert(maxDiff(ours, theirs) <= 1, s"quality=$quality")
    }
  }

  test("ImageIO-encoded RGB (YCbCr, subsampled chroma) — our Y plane " +
      "matches ImageIO's decoded luma") {
    val rnd = new scala.util.Random(6)
    val w = 37; val h = 26 // non-MCU-aligned for 2x2 sampling
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = rnd.nextInt(256); val g = rnd.nextInt(256)
      val b = rnd.nextInt(256)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoBytes(bi, 0.9f)
    val (dw, dh, ours) = decodeOrFail(bytes)
    assert((dw, dh) === ((w, h)))
    // oracle luma: ImageIO decode → BT.601 gray (chroma cancels to
    // first order; clamping + 4:2:0 upsample leave a few-level residue)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var worst = 0
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
        29 * (rgb & 0xff)) >> 8
      val d = math.abs(ours(y * w + x) - luma)
      worst = math.max(worst, d)
      total += d
    }
    // random saturated colors clip in the oracle's YCbCr→RGB leg, so a
    // few pixels carry a non-cancelling chroma residue — bound the tail
    // loosely and the body tightly
    assert(worst <= 10, s"max luma deviation $worst")
    assert(total.toDouble / (w * h) <= 1.5,
      s"mean luma deviation ${total.toDouble / (w * h)}")
  }

  // ---- sampling + Huffman breadth (r11 directive #7) -----------------

  /** ImageIO JPEG with EXPLICIT luma sampling factors (via the native
    * metadata's sof/componentSpec node) and optionally writer-counted
    * (non-Annex-K) Huffman tables. */
  private def imageIoBytesSampled(bi: BufferedImage, quality: Float,
      hs: Int, vs: Int, optimizedHuffman: Boolean): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.asInstanceOf[javax.imageio.plugins.jpeg.JPEGImageWriteParam]
      .setOptimizeHuffmanTables(optimizedHuffman)
    val spec =
      javax.imageio.ImageTypeSpecifier.createFromRenderedImage(bi)
    val meta = writer.getDefaultImageMetadata(spec, p)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    val comps = tree.getElementsByTagName("componentSpec")
    assert(comps.getLength >= 1, "no componentSpec in default metadata")
    val yComp = comps.item(0).asInstanceOf[org.w3c.dom.Element]
    yComp.setAttribute("HsamplingFactor", hs.toString)
    yComp.setAttribute("VsamplingFactor", vs.toString)
    meta.setFromTree(fmt, tree)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(bi, null, meta), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** First component's (h<<4 | v) sampling byte from the stream's SOF —
    * pins that the writer honored the requested factors, so the matrix
    * below cannot silently degenerate to one sampling. */
  private def sofSampling(p: Array[Byte]): Int = {
    var i = 2
    while (i + 3 < p.length) {
      val marker = p(i + 1) & 0xff
      if ((p(i) & 0xff) != 0xff) fail("lost marker sync")
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
          marker != 0xc8 && marker != 0xcc)
        return p(i + 11) & 0xff // SOF: len(2) prec(1) h(2) w(2) id(1) samp
      val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      i += 2 + len
    }
    fail("no SOF marker")
  }

  /** Raw bytes of the first DHT segment (to pin that optimized streams
    * really carry writer-counted tables, not Annex-K). */
  private def firstDht(p: Array[Byte]): Seq[Byte] = {
    var i = 2
    while (i + 3 < p.length) {
      val marker = p(i + 1) & 0xff
      val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      if (marker == 0xc4) return p.slice(i + 4, i + 2 + len).toSeq
      i += 2 + len
    }
    fail("no DHT marker")
  }

  test("ImageIO RGB at 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 and optimized " +
      "(writer-counted) Huffman tables all decode: Y plane matches " +
      "ImageIO's luma") {
    val rnd = new scala.util.Random(0x422444)
    val w = 37; val h = 26 // non-MCU-aligned for every sampling
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = rnd.nextInt(256); val g = rnd.nextInt(256)
      val b = rnd.nextInt(256)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    // (hs, vs, optimized): the sampling matrix plus optimized-Huffman
    // runs at the two extreme samplings
    val cases = Seq((1, 1, false), (2, 1, false), (1, 2, false),
      (2, 2, false), (1, 1, true), (2, 2, true))
    for ((hs, vs, opt) <- cases) {
      val bytes = imageIoBytesSampled(bi, 0.9f, hs, vs, opt)
      assert(sofSampling(bytes) === ((hs << 4) | vs),
        s"writer ignored sampling $hs x$vs")
      if (opt) // counted tables must differ from the standard ones
        assert(firstDht(bytes) !==
          firstDht(imageIoBytesSampled(bi, 0.9f, hs, vs, false)),
          "optimized stream carries the default tables")
      val (dw, dh, ours) = decodeOrFail(bytes)
      assert((dw, dh) === ((w, h)), s"$hs x$vs opt=$opt")
      val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var worst = 0
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = back.getRGB(x, y)
        val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
          29 * (rgb & 0xff)) >> 8
        val d = math.abs(ours(y * w + x) - luma)
        worst = math.max(worst, d)
        total += d
      }
      // same bound family as the 4:2:0 test above: saturated random
      // colors clip in the oracle's YCbCr->RGB leg, and the clip
      // residue is sampling-dependent (measured worst: 16 at 4:2:2) —
      // the MEAN bound is the real assertion, the tail is just capped
      assert(worst <= 20, s"$hs x$vs opt=$opt max deviation $worst")
      assert(total.toDouble / (w * h) <= 1.5,
        s"$hs x$vs opt=$opt mean deviation ${total.toDouble / (w * h)}")
    }
  }

  test("ImageIO grayscale with optimized Huffman tables decodes (+-1)") {
    val rnd = new scala.util.Random(0x422445)
    val img = Array.fill(26, 37)(rnd.nextInt(256))
    val bytes = imageIoBytesSampled(grayImage(img), 0.95f, 1, 1,
      optimizedHuffman = true)
    val (dw, dh, ours) = decodeOrFail(bytes)
    assert((dw, dh) === ((37, 26)))
    val (_, _, theirs) = imageIoGray(bytes)
    val worst = ours.lazyZip(theirs).map((a, b) => math.abs(a - b)).max
    assert(worst <= 1, s"gray optimized-Huffman deviation $worst")
  }

  // ---- rejection classes --------------------------------------------

  // ---- progressive (r11 second slice) -------------------------------

  test("our progressive encode decodes IDENTICALLY to our baseline " +
      "encode (same quantized coefficients, two scan layouts)") {
    val rnd = new scala.util.Random(7)
    for ((w, h, q) <- Seq((40, 24, JpegBuild.UnitQuant),
        (17, 9, JpegBuild.LossyQuant), (8, 8, JpegBuild.UnitQuant),
        (3, 21, JpegBuild.LossyQuant))) {
      val img = randImg(rnd, w, h)
      val base = decodeOrFail(JpegBuild.gray(w, h, quant = q)(
        (x, y) => img(y)(x)))
      val prog = decodeOrFail(JpegBuild.grayProgressive(w, h, quant = q)(
        (x, y) => img(y)(x)))
      assert((prog._1, prog._2) === ((w, h)))
      assert(base._3.toSeq === prog._3.toSeq, s"${w}x$h")
    }
  }

  test("progressive constant blocks keep the q110 exactness contract") {
    val rnd = new scala.util.Random(110)
    val cells = Array.fill(8, 9)(1 + rnd.nextInt(200))
    def px(x: Int, y: Int): Int = cells(y / 8)(x / 8)
    val (w, h, pix) = decodeOrFail(JpegBuild.grayProgressive(72, 64)(px))
    assert((w, h) === ((72, 64)))
    for (y <- 0 until 64; x <- 0 until 72)
      assert(pix(y * 72 + x) === px(x, y), s"($x,$y)")
    val bmpHash = ImagePixels.dhashOf(
      ImageBuild.bmp24Gray(72, 64)(px)).get
    val progHash = ImagePixels.dhashOf(
      JpegBuild.grayProgressive(72, 64)(px)).get
    assert(bmpHash === progHash)
  }

  test("a real ImageIO progressive stream (successive approximation + " +
      "refinement scans) decodes to ImageIO's own pixels (±1)") {
    val rnd = new scala.util.Random(8)
    for ((quality, w, h) <- Seq((0.9f, 40, 28), (0.5f, 33, 17))) {
      val img = randImg(rnd, w, h)
      val bytes = imageIoBytes(grayImage(img), quality, progressive = true)
      val (dw, dh, ours) = decodeOrFail(bytes)
      val (iw, ih, theirs) = imageIoGray(bytes)
      assert((dw, dh) === ((iw, ih)))
      assert(maxDiff(ours, theirs) <= 1, s"quality=$quality ${w}x$h")
    }
  }

  test("ImageIO progressive RGB (YCbCr, chroma scans byte-skipped) — " +
      "our Y plane matches ImageIO's decoded luma") {
    val rnd = new scala.util.Random(9)
    val w = 29; val h = 22
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, rnd.nextInt(1 << 24))
    val bytes = imageIoBytes(bi, 0.85f, progressive = true)
    val (dw, dh, ours) = decodeOrFail(bytes)
    assert((dw, dh) === ((w, h)))
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var worst = 0
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
        29 * (rgb & 0xff)) >> 8
      val d = math.abs(ours(y * w + x) - luma)
      worst = math.max(worst, d); total += d
    }
    assert(worst <= 10, s"max luma deviation $worst")
    assert(total.toDouble / (w * h) <= 1.5,
      s"mean luma deviation ${total.toDouble / (w * h)}")
  }

  test("our progressive bytes decode in ImageIO to the pixels we decode") {
    val rnd = new scala.util.Random(10)
    val img = randImg(rnd, 24, 18)
    val bytes = JpegBuild.grayProgressive(24, 18,
      quant = JpegBuild.LossyQuant)((x, y) => img(y)(x))
    val (dw, dh, ours) = decodeOrFail(bytes)
    val (iw, ih, theirs) = imageIoGray(bytes)
    assert((dw, dh) === ((iw, ih)))
    assert(maxDiff(ours, theirs) <= 1)
  }

  test("truncated progressive streams are corrupt, never partial/throw") {
    val img = Array.tabulate(24, 24)((y, x) => (x * 11 + y * 5) % 256)
    val good = JpegBuild.grayProgressive(24, 24)((x, y) => img(y)(x))
    // cut inside the AC scan and inside the DC scan
    for (cut <- Seq(good.length - 6, good.length / 2, 100, 20))
      assert(JpegPixels.decodeGray(good.take(cut)) === Left("corrupt"),
        s"cut=$cut")
  }

  test("rejection matrix: corrupt / unsupported / oversized") {
    val good = JpegBuild.gray(16, 16)((x, y) => (x + y) % 256)
    // truncated mid-scan: data runs out before the MCUs complete
    assert(JpegPixels.decodeGray(good.take(good.length - 8)) ===
      Left("corrupt"))
    // truncated mid-header
    assert(JpegPixels.decodeGray(good.take(6)) === Left("corrupt"))
    // EOI right after SOI: no scan
    assert(JpegPixels.decodeGray(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === Left("corrupt"))
    // 12-bit precision claim
    val prec12 = good.clone
    val sof = indexOfMarker(prec12, 0xc0)
    prec12(sof + 4) = 12.toByte
    assert(JpegPixels.decodeGray(prec12) === Left("unsupported"))
    // 4-component (Adobe CMYK class) — patch count only; parse stops there
    val cmyk = good.clone
    cmyk(sof + 9) = 4.toByte
    assert(JpegPixels.decodeGray(cmyk) === Left("unsupported"))
    // header-probe twin from MediaBuild (SOI+SOF0+EOI, no tables/scan)
    assert(JpegPixels.decodeGray(Multimodal.MediaBuild.jpeg(8, 8)) ===
      Left("corrupt"))
    // oversized: dims past the pixel cap
    val huge = good.clone
    huge(sof + 5) = 0x7f.toByte; huge(sof + 7) = 0x7f.toByte
    assert(JpegPixels.decodeGray(huge) === Left("oversized"))
    // oversized: plausible dims, but the scan is too small to carry them
    val thin = good.clone
    thin(sof + 5) = 0x08.toByte // h: 0x0810 = 2064
    thin(sof + 7) = 0x08.toByte // w: 2064 → 4.2M px, scan ~100 B
    assert(JpegPixels.decodeGray(thin) === Left("oversized"))
  }

  test("ImagePixels dispatch + Multimodal.contentReason route JPEG") {
    val good = JpegBuild.gray(16, 16)((x, y) => (x * 7 + y) % 256)
    assert(ImagePixels.decodeGrayReason(good).isRight)
    assert(Multimodal.MediaDecoder.contentReason(good) === "ok")
    assert(Multimodal.MediaDecoder.contentReason(
      JpegBuild.grayProgressive(16, 16)((x, y) => (x * 7 + y) % 256)) ===
      "ok")
    assert(Multimodal.MediaDecoder.contentReason(
      JpegBuild.precision12Twin(good)) === "unsupported")
    assert(Multimodal.MediaDecoder.contentReason(
      Multimodal.MediaBuild.jpeg(8, 8)) === "corrupt")
  }

  // ---- sequential non-interleaved (one scan per component) ----------

  /** Splice three gray encodes into one 3-component NON-INTERLEAVED
    * sequential file: shared DQT/DHT, SOF0 with ids 1/2/3 at 1×1, then
    * one full-band SOS per component whose entropy body is lifted
    * verbatim from the matching gray encode (a single-component scan's
    * bits are identical in both layouts). */
  private def spliceNonInterleaved(
      imgs: Seq[Array[Array[Int]]]): Array[Byte] = {
    require(imgs.size == 3)
    val h = imgs(0).length; val w = imgs(0)(0).length
    val encs = imgs.map(im => JpegBuild.gray(w, h)((x, y) => im(y)(x)))
    def body(p: Array[Byte]): Array[Byte] = {
      val sos = indexOfMarker(p, 0xda)
      val len = ((p(sos + 2) & 0xff) << 8) | (p(sos + 3) & 0xff)
      java.util.Arrays.copyOfRange(p, sos + 2 + len, p.length - 2)
    }
    val out = new ByteArrayOutputStream()
    def be16(x: Int): Unit = { out.write(x >> 8); out.write(x & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    val enc0 = encs(0)
    val sofAt = indexOfMarker(enc0, 0xc0)
    val dhtAt = indexOfMarker(enc0, 0xc4)
    val sosAt = indexOfMarker(enc0, 0xda)
    out.write(enc0, 0, sofAt) // SOI + APP0 + DQT
    marker(0xc0); be16(8 + 9)
    out.write(8); be16(h); be16(w); out.write(3)
    for (cid <- 1 to 3) { out.write(cid); out.write(0x11); out.write(0) }
    out.write(enc0, dhtAt, sosAt - dhtAt) // both DHT segments
    for (c <- 0 until 3) {
      marker(0xda); be16(8)
      out.write(1); out.write(c + 1); out.write(0x00)
      out.write(0); out.write(63); out.write(0)
      val b = body(encs(c)); out.write(b, 0, b.length)
    }
    marker(0xd9)
    out.toByteArray
  }

  test("sequential non-interleaved 3-component files decode: Y comes " +
      "from its own scan, chroma scans are skipped") {
    val rnd = new scala.util.Random(12)
    val y = randImg(rnd, 19, 13)
    val cb = randImg(rnd, 19, 13)
    val cr = randImg(rnd, 19, 13)
    val spliced = spliceNonInterleaved(Seq(y, cb, cr))
    val expected = decodeOrFail(
      JpegBuild.gray(19, 13)((px, py) => y(py)(px)))
    val got = decodeOrFail(spliced)
    assert((got._1, got._2) === ((19, 13)))
    assert(got._3.toSeq === expected._3.toSeq)
  }

  test("a spliced non-interleaved file is legal JPEG: ImageIO reads " +
      "it and agrees on the Y plane (neutral chroma)") {
    val rnd = new scala.util.Random(13)
    val y = randImg(rnd, 16, 16)
    val neutral = Array.fill(16, 16)(128) // Cb=Cr=128 → RGB ≈ gray(Y)
    val spliced = spliceNonInterleaved(Seq(y, neutral, neutral))
    val (w, h, ours) = decodeOrFail(spliced)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(spliced))
    assert(back != null, "ImageIO rejected the spliced layout")
    assert((back.getWidth, back.getHeight) === ((w, h)))
    var worst = 0
    for (yy <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, yy)
      val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
        29 * (rgb & 0xff)) >> 8
      worst = math.max(worst, math.abs(ours(yy * w + x) - luma))
    }
    assert(worst <= 3, s"max luma deviation $worst")
  }

  test("a partially-interleaved sequential scan (2 of 3 components) " +
      "is 'unsupported'") {
    val rnd = new scala.util.Random(14)
    val imgs = Seq.fill(3)(randImg(rnd, 16, 16))
    val spliced = spliceNonInterleaved(imgs)
    // rewrite the FIRST SOS to claim ns=2 (Y + Cb): longer header, so
    // rebuild the prefix and splice junk entropy — the decoder must
    // reject at the scan header, before any entropy read
    val sos = indexOfMarker(spliced, 0xda)
    val out = new ByteArrayOutputStream()
    out.write(spliced, 0, sos)
    out.write(0xff); out.write(0xda)
    out.write(0); out.write(10) // len = 6 + 2*2
    out.write(2)
    out.write(1); out.write(0x00); out.write(2); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    out.write(0x55); out.write(0x55)
    out.write(0xff); out.write(0xd9)
    assert(JpegPixels.decodeGray(out.toByteArray) === Left("unsupported"))
  }

  // ---- review-hardening regressions (r11 inline review) -------------

  test("a progressive scan referencing a missing Huffman table is " +
      "corrupt, not an NPE") {
    val good = JpegBuild.grayProgressive(16, 16)((x, y) => (x + y) % 256)
    // DHT DC segment's class/id byte: 0x00 → 0x01 re-homes the DC
    // table to slot 1; the scans still reference slot 0
    val dht = indexOfMarker(good, 0xc4)
    val patched = good.clone
    patched(dht + 4) = 0x01.toByte
    assert(JpegPixels.decodeGray(patched) === Left("corrupt"))
  }

  test("a Y-subsampled 3-component frame routes to 'unsupported', " +
      "never a garbled crop") {
    // minimal SOI + SOF0 with Y=1x1 but Cb=2x2 — rejected at the SOF,
    // before any scan is needed
    val b = java.nio.ByteBuffer.allocate(21)
    b.put(0xff.toByte).put(0xd8.toByte)
    b.put(0xff.toByte).put(0xc0.toByte).putShort(17)
    b.put(8.toByte).putShort(16).putShort(16).put(3.toByte)
    b.put(1.toByte).put(0x11.toByte).put(0.toByte) // Y 1x1
    b.put(2.toByte).put(0x22.toByte).put(0.toByte) // Cb 2x2 > Y
    b.put(3.toByte).put(0x11.toByte).put(0.toByte)
    assert(JpegPixels.decodeGray(b.array()) === Left("unsupported"))
  }

  test("single-component frames ignore declared sampling factors " +
      "(T.81 A.2: non-interleaved, MCU = one data unit)") {
    val img = Array.tabulate(24, 33)((y, x) => (x * 5 + y * 11) % 256)
    val plain = JpegBuild.gray(33, 24)((x, y) => img(y)(x))
    val expected = decodeOrFail(plain)._3
    val sof = indexOfMarker(plain, 0xc0)
    for (hv <- Seq(0x22, 0x21, 0x14)) {
      val patched = plain.clone
      patched(sof + 11) = hv.toByte // the single component's h/v byte
      val (w, h, pix) = decodeOrFail(patched)
      assert((w, h) === ((33, 24)), s"hv=$hv")
      assert(pix.toSeq === expected.toSeq, s"hv=$hv")
    }
  }

  test("precision12Twin patches the SOF even when the DQT payload " +
      "contains an FF C0 byte pair") {
    val q = JpegBuild.UnitQuant.clone
    q(0) = 255; q(1) = 192 // zigzag-adjacent → FF C0 inside DQT
    val bytes = JpegBuild.gray(8, 8, quant = q)((x, y) => (x * y) % 256)
    assert(JpegPixels.decodeGray(bytes).isRight) // sanity: legal table
    assert(JpegPixels.decodeGray(JpegBuild.precision12Twin(bytes)) ===
      Left("unsupported"))
  }

  private def indexOfMarker(p: Array[Byte], m: Int): Int = {
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == m) return i
      i += 1
    }
    fail(s"marker ${m.toHexString} not found")
  }
}
