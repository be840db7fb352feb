package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageDedup, WebpPixels}
import graft.operators.WebpPixels.WebpBuild

/** VP8L decoder/builder pins. No JDK WEBP codec exists, so unlike the
  * PNG/JPEG/TIFF/WAV suites there is no third-party oracle here; the
  * conformance evidence is (a) the full feature-matrix roundtrip
  * against the spec-shaped builder, (b) hash parity with the BMP twin
  * (lossless → bit-exact, the q110 discipline), and (c) the
  * distance-map pin against libwebp's published packed constants. */
class WebpPixelsSpec extends AnyFunSuite {

  private def img(seed: Int): (Int, Int) => Int = { (x, y) =>
    var z = seed * 977L + y * 18L + x + 0x9e37L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z ^= z >>> 31
    java.lang.Math.floorMod(z, 256L).toInt
  }

  private def expect(w: Int, h: Int, f: (Int, Int) => Int): Seq[Int] =
    Array.tabulate(h, w)((y, x) => f(x, y)).flatten.toSeq

  private def decode(p: Array[Byte]): (Int, Int, Seq[Int]) = {
    val Right((w, h, px)) = WebpPixels.decodeGray(p)
    (w, h, px.toSeq)
  }

  test("plain literal stream roundtrips exactly (odd dims, 1x1, 1-row)") {
    for ((w, h, seed) <- Seq((18, 16, 1), (19, 13, 2), (1, 1, 3),
        (37, 1, 4), (1, 29, 5))) {
      val f = img(seed)
      val bytes = WebpBuild.vp8lGray(w, h)(f)
      assert(decode(bytes) === ((w, h, expect(w, h, f))), s"$w x$h")
    }
  }

  test("subtract-green transform roundtrips (gray: r,b residuals 0)") {
    val f = img(6)
    val bytes = WebpBuild.vp8lGray(18, 16, subtractGreen = true)(f)
    assert(decode(bytes) === ((18, 16, expect(18, 16, f))))
    // and genuinely differs on the wire from the plain encoding
    assert(!java.util.Arrays.equals(bytes, WebpBuild.vp8lGray(18, 16)(f)))
  }

  test("predictor transform roundtrips for EVERY mode 0..13, the mixed " +
      "per-block pattern, and composed with subtract-green") {
    val f = img(7)
    for (mode <- 0 to 14) { // 14 = per-block mixed
      val bytes = WebpBuild.vp8lGray(21, 19, predictorMode = mode)(f)
      assert(decode(bytes) === ((21, 19, expect(21, 19, f))), s"mode $mode")
      val both = WebpBuild.vp8lGray(21, 19, subtractGreen = true,
        predictorMode = mode)(f)
      assert(decode(both) === ((21, 19, expect(21, 19, f))), s"SG+$mode")
    }
  }

  test("palette roundtrips at every packing width (2/4/16/256 colors)") {
    for ((mod, label) <- Seq((2, "1-bit"), (4, "2-bit"), (16, "4-bit"),
        (200, "unpacked"))) {
      val f = (x: Int, y: Int) => img(8)(x, y) % mod
      // odd width: the last packed byte of each row carries filler bits
      val bytes = WebpBuild.vp8lGray(19, 16, paletted = true)(f)
      assert(decode(bytes) === ((19, 16, expect(19, 16, f))), label)
    }
  }

  test("palette COMPOSED with subtract-green (SG read first: inverse " +
      "at full width post-unpack) roundtrips at every packing width") {
    for ((mod, label) <- Seq((2, "1-bit"), (4, "2-bit"), (16, "4-bit"),
        (200, "unpacked"))) {
      val f = (x: Int, y: Int) => img(25)(x, y) % mod
      val bytes = WebpBuild.vp8lGray(19, 16, paletted = true,
        subtractGreen = true)(f)
      assert(decode(bytes) === ((19, 16, expect(19, 16, f))), label)
      // the SG header is genuinely on the wire: differs from
      // palette-alone
      assert(!java.util.Arrays.equals(bytes,
        WebpBuild.vp8lGray(19, 16, paletted = true)(f)), label)
    }
  }

  test("palette COMPOSED with the predictor (palette read first: the " +
      "predictor tiles and inverts over the PACKED width) roundtrips " +
      "at every packing width and across modes") {
    for ((mod, label) <- Seq((2, "1-bit"), (4, "2-bit"), (16, "4-bit"),
        (200, "unpacked")); mode <- Seq(1, 2, 11, 14)) {
      val f = (x: Int, y: Int) => img(26)(x, y) % mod
      val bytes = WebpBuild.vp8lGray(19, 16, paletted = true,
        predictorMode = mode)(f)
      assert(decode(bytes) === ((19, 16, expect(19, 16, f))),
        s"$label mode $mode")
    }
    // wide-enough image that the packed width spans >1 predictor block
    val f16 = (x: Int, y: Int) => img(27)(x, y) % 16
    val wide = WebpBuild.vp8lGray(70, 9, paletted = true,
      predictorMode = 14)(f16)
    assert(decode(wide) === ((70, 9, expect(70, 9, f16))))
  }

  test("trailing garbage after a complete VP8L chunk decodes ok " +
      "(libwebp stops at the image chunk; r13 ADVICE)") {
    val f = img(28)
    val good = WebpBuild.vp8lGray(18, 16)(f)
    // >= 8 bytes of non-chunk garbage: a malformed trailing header
    val garbage = good ++ Array[Byte](0x47, 0x41, 0x52, 0x42,
      0x7f, -1, -1, 0x7f, 1, 2, 3)
    assert(decode(garbage) === decode(good))
    // a truncated trailing metadata chunk header (valid fourcc, size
    // past the file end) is also tolerated after the image chunk
    val truncMeta = good ++ "EXIF".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0, 0, 0) // declares 64 bytes, none present
    assert(decode(truncMeta) === decode(good))
    // but BEFORE any image chunk the same shape stays corrupt
    val noImage = ("RIFF" + "????" + "WEBP" +
      "EXIF").getBytes("US-ASCII") ++ Array[Byte](0x40, 0, 0, 0)
    assert(WebpPixels.decodeGray(noImage) === Left("corrupt"))
    // r14 ADVICE decision pin — libwebp-stop semantics: a well-formed
    // routing chunk AFTER the malformed trailing header is intentionally
    // never read (a tail scan for fourccs would false-positive on
    // garbage bytes and re-break the files this test re-admitted); a
    // real animated file announces itself via the VP8X animation flag,
    // which the walk reads BEFORE any image chunk...
    val postGarbageAnim = garbage ++
      "ANIM".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(decode(postGarbageAnim) === decode(good))
    // ...so the anim flag set before the garbage still routes
    // unsupported even with the same trailing garbage present
    val animThenGarbage = WebpBuild.vp8x(good, anim = true) ++
      Array[Byte](0x47, 0x41, 0x52, 0x42, 0x7f, -1, -1, 0x7f)
    assert(WebpPixels.decodeGray(animThenGarbage) === Left("unsupported"))
  }

  test("LZ77 runs roundtrip: direct and neighborhood-mapped dist-1 " +
      "(overlapping copies), run crossing row boundaries") {
    // long constant spans force dist-1 length-coded copies
    val f = (x: Int, y: Int) => if ((x / 9 + y) % 2 == 0) 40 else 200
    for (mapDist <- Seq(false, true)) {
      val bytes = WebpBuild.vp8lGray(36, 24, backrefs = true,
        mapDistances = mapDist)(f)
      assert(decode(bytes) === ((36, 24, expect(36, 24, f))),
        s"mapDistances=$mapDist")
    }
    // an entirely constant image is one literal + one max-length-ish run
    val const = WebpBuild.vp8lGray(64, 64, backrefs = true)((_, _) => 77)
    assert(decode(const) === ((64, 64, Seq.fill(64 * 64)(77))))
  }

  test("comb-code streams (11-15-bit codes) roundtrip: the long-code " +
      "fallback past the 10-bit root table sees traffic") {
    val f = (x: Int, y: Int) => img(19)(x, y) % 16 // symbols 0..15 incl. deep
    val bytes = WebpBuild.vp8lGray(23, 17, combLiterals = true)(f)
    assert(decode(bytes) === ((23, 17, expect(23, 17, f))))
    // force traffic on the deepest codes specifically
    val deep = WebpBuild.vp8lGray(16, 2, combLiterals = true)(
      (x, _) => x) // one pixel of every symbol incl. 14 and 15
    assert(decode(deep) === ((16, 2, expect(16, 2, (x, _) => x))))
  }

  test("color cache roundtrips at several sizes and composes with runs") {
    val f = (x: Int, y: Int) => img(9)(x, y) % 7 * 36 // few distinct values
    for (bits <- Seq(1, 4, 11)) {
      val bytes = WebpBuild.vp8lGray(18, 16, cacheBits = bits)(f)
      assert(decode(bytes) === ((18, 16, expect(18, 16, f))), s"bits=$bits")
    }
    val both = WebpBuild.vp8lGray(36, 24, backrefs = true, cacheBits = 6)(
      (x, y) => if ((x / 9 + y) % 2 == 0) 40 else 200)
    assert(decode(both)._3 === expect(36, 24,
      (x, y) => if ((x / 9 + y) % 2 == 0) 40 else 200))
  }

  test("cross-color transform roundtrips: alone, composed with " +
      "subtract-green + predictor (both read orders), with runs/cache") {
    val f = img(21)
    val alone = WebpBuild.vp8lGray(21, 19, crossColor = true)(f)
    assert(decode(alone) === ((21, 19, expect(21, 19, f))))
    // genuinely different wire bytes from the plain encoding
    assert(!java.util.Arrays.equals(alone, WebpBuild.vp8lGray(21, 19)(f)))
    // all three transforms together, in both forward orders (the
    // decoder inverts in reverse read order; cross-color's red-feedback
    // arithmetic does not commute with the predictor)
    for (mode <- Seq(5, 11, 12, 13); pFirst <- Seq(false, true)) {
      val bytes = WebpBuild.vp8lGray(21, 19, subtractGreen = true,
        predictorMode = mode, crossColor = true,
        predictorFirst = pFirst)(f)
      assert(decode(bytes) === ((21, 19, expect(21, 19, f))),
        s"mode $mode predictorFirst=$pFirst")
    }
    // cross-color under LZ77 runs + cache (transformed planes still
    // carry runs on this striped image)
    val striped = (x: Int, y: Int) => if ((x / 9 + y) % 2 == 0) 40 else 200
    val rich = WebpBuild.vp8lGray(36, 24, crossColor = true,
      backrefs = true, cacheBits = 5)(striped)
    assert(decode(rich) === ((36, 24, expect(36, 24, striped))))
  }

  test("meta-Huffman roundtrips: 2-5 groups with per-group DISTINCT " +
      "code assignments, with cache + runs, and composed with all " +
      "three transforms") {
    val f = img(22)
    for (groups <- Seq(2, 3, 5)) {
      val bytes = WebpBuild.vp8lGray(40, 24, metaGroups = groups,
        metaBits = 2)(f)
      assert(decode(bytes) === ((40, 24, expect(40, 24, f))),
        s"$groups groups")
    }
    // wire differs from the single-group encoding (the indirection and
    // the rotated per-group codes are really present)
    assert(!java.util.Arrays.equals(
      WebpBuild.vp8lGray(40, 24, metaGroups = 2, metaBits = 2)(f),
      WebpBuild.vp8lGray(40, 24)(f)))
    // the color cache is GLOBAL across groups; runs start in one tile
    // and copy into the next, so group handoff around LZ77 is exercised
    val striped = (x: Int, y: Int) => if ((x / 9 + y) % 2 == 0) 40 else 200
    val rich = WebpBuild.vp8lGray(40, 24, metaGroups = 3, metaBits = 2,
      backrefs = true, cacheBits = 5, mapDistances = true)(striped)
    assert(decode(rich) === ((40, 24, expect(40, 24, striped))))
    // meta + subtract-green + predictor + cross-color in one stream
    val full = WebpBuild.vp8lGray(40, 24, metaGroups = 2, metaBits = 2,
      subtractGreen = true, predictorMode = 11, crossColor = true)(f)
    assert(decode(full) === ((40, 24, expect(40, 24, f))))
  }

  test("cross-color inverse arithmetic matches HAND-COMPUTED " +
      "ColorTransformDelta vectors (evidence independent of the " +
      "builder's forward pass)") {
    // delta(t, c) = (int8 t * int8 c) >> 5, applied red-first with the
    // RECONSTRUCTED red feeding blue's second delta (RFC 9649 /
    // libwebp VP8LTransformColorInverse). Each case worked by hand:
    def run(argb: Int, g2r: Int, g2b: Int, r2b: Int): Int = {
      val pix = Array(argb)
      val cc = 0xff000000 | (r2b << 16) | (g2b << 8) | g2r
      WebpPixels.applyInverseCrossColor(pix, 1, 1, Array(cc), 2)
      pix(0)
    }
    // identity multipliers: pixel unchanged
    assert(run(0xff402010, 0, 0, 0) === 0xff402010)
    // g2r=0x40 (+64), green=0x20 (32): dRed = (64*32)>>5 = +64 ->
    //   red 0x40 + 64 = 0x80
    // g2b=0xE0 (-32): dBlue1 = (-32*32)>>5 = -32 -> 0x10 - 32 = 0xF0
    // r2b=0x10 (+16) on NEW red 0x80 (int8 -128):
    //   dBlue2 = (16*-128)>>5 = -64 -> 0xF0 - 64 = 0xB0
    assert(run(0xff402010, 0x40, 0xE0, 0x10) === 0xff8020B0)
    // negative green: green=0x90 (int8 -112), g2r=0x30 (+48):
    //   dRed = (48*-112)>>5 = floor(-5376/32) = -168 ->
    //   red 0x00 - 168 = 0x58 (mod 256)
    assert(run(0xff009000, 0x30, 0, 0) === 0xff589000)
    // blue-only via r2b on an UNCHANGED red: red=0x7f (int8 +127),
    //   r2b=0x81 (int8 -127): dBlue2 = (-127*127)>>5 =
    //   floor(-16129/32) = -505 -> blue 0x00 - 505 = 7 (mod 256)
    assert(run(0xff7f0000, 0, 0, 0x81) === 0xff7f0007)
    // per-tile selection: two tiles at sizeBits=2 (tile width 4), the
    // second tile's multipliers apply from x=4
    val row = Array.fill(8)(0xff402010)
    val ccs = Array(0xff000000, 0xff000000 | 0x40) // tile1: g2r=0x40
    WebpPixels.applyInverseCrossColor(row, 8, 1, ccs, 2)
    assert(row.take(4).forall(_ === 0xff402010))
    assert(row.drop(4).forall(_ === 0xff802010))
  }

  test("meta-Huffman group count past the 4096 policy cap routes " +
      "oversized BEFORE the code tables allocate; 4096 (above " +
      "libwebp's 2600-histogram encoder max) decodes") {
    val f = (x: Int, y: Int) => (x + y) % 256
    // 16384 px wide at metaBits=2 -> 4096 tile columns, 2 tile rows:
    // the (tx+ty)%n pattern reaches indices 0..4096
    val over = WebpBuild.vp8lGray(16384, 8, metaGroups = 4097,
      metaBits = 2)(f)
    assert(WebpPixels.decodeGray(over) === Left("oversized"))
    val atCap = WebpBuild.vp8lGray(16384, 8, metaGroups = 4096,
      metaBits = 2)(f)
    val Right((w, h, px)) = WebpPixels.decodeGray(atCap)
    assert((w, h) === ((16384, 8)))
    assert(px.toSeq === expect(16384, 8, f))
  }

  test("out-of-spec predictor modes 14/15 resolve to the black " +
      "predictor like libwebp's sentinel table (r12 ADVICE)") {
    val f = img(23)
    // predictorMode 15 writes wire modes 14/15 per block while the
    // forward pass predicts with mode 0 — decoding proves the clamp
    val bytes = WebpBuild.vp8lGray(21, 19, predictorMode = 15)(f)
    assert(decode(bytes) === ((21, 19, expect(21, 19, f))))
    // and the wire really carries out-of-spec modes: it differs from
    // the same image at fixed mode 0
    assert(!java.util.Arrays.equals(bytes,
      WebpBuild.vp8lGray(21, 19, predictorMode = 0)(f)))
  }

  test("VP8X extended container (r13): still lossless + EXIF decodes " +
      "bit-identically to the bare file; animation flag, ANMF chunks, " +
      "composite canvas, and lossy-ALPH route unsupported") {
    val f = img(24)
    val bare = WebpBuild.vp8lGray(21, 19, subtractGreen = true,
      predictorMode = 5)(f)
    val wrapped = WebpBuild.vp8x(bare)
    assert(decode(wrapped) === ((21, 19, expect(21, 19, f))))
    assert(decode(wrapped) === decode(bare))
    // the wrapper really added VP8X + EXIF chunks
    assert(new String(wrapped, 12, 4, "US-ASCII") === "VP8X")
    assert(wrapped.length > bare.length + 18)
    // animation flag routes out even with a decodable VP8L inside
    assert(WebpPixels.decodeGray(WebpBuild.vp8x(bare, anim = true)) ===
      Left("unsupported"))
    // composite canvas (offset/crop framing) is not honored
    assert(WebpPixels.decodeGray(
      WebpBuild.vp8x(bare, canvasW = 42, canvasH = 19)) ===
      Left("unsupported"))
    // an ANMF frame chunk routes out wherever it appears
    val anmf = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(wrapped, 0, wrapped.length)
      out.write("ANMF".getBytes("US-ASCII"))
      out.write(Array[Byte](2, 0, 0, 0, 0, 0))
      val b = out.toByteArray
      // fix the RIFF size for the appended chunk
      val size = b.length - 8
      b(4) = (size & 0xff).toByte; b(5) = ((size >> 8) & 0xff).toByte
      b(6) = ((size >> 16) & 0xff).toByte; b(7) = ((size >> 24) & 0xff).toByte
      b
    }
    assert(WebpPixels.decodeGray(anmf) === Left("unsupported"))
    // truncations of the wrapped file never throw
    for (n <- 0 until wrapped.length - 2)
      assert(WebpPixels.decodeGray(wrapped.take(n)).isLeft, s"take($n)")
  }

  test("distance map matches libwebp's packed kCodeToPlane constants " +
      "on the published prefix") {
    // first ten entries of libwebp's kCodeToPlane: (y<<4) | (8-x)
    val packed = Seq(0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29,
      0x16, 0x1a)
    for ((pc, i) <- packed.zipWithIndex) {
      val y = pc >> 4
      val x = 8 - (pc & 0xf)
      val w = 100
      val want = math.max(1, y * w + x)
      assert(WebpPixels.planeCodeToDistance(w, i + 1) === want, s"code ${i + 1}")
    }
    // direct codes pass through
    assert(WebpPixels.planeCodeToDistance(100, 121) === 1)
    assert(WebpPixels.planeCodeToDistance(100, 500) === 380)
    // a mapped code whose offset would be non-positive clamps to 1
    assert(WebpPixels.planeCodeToDistance(1, 4) === 1) // (-1,1): 1*1-1=0 -> 1
  }

  test("the FULL 120-entry distance map equals its structural " +
      "derivation (closest neighborhood sorted by squared distance, " +
      "then |dx|, positive dx first)") {
    // the spec's table is exactly: {(dx,0): 1<=dx<=8} ∪
    // {(dx,dy): 1<=dy<=7, -7<=dx<=8}, ordered by (dx²+dy², |dx|, sign)
    // — an independent derivation, so the hand-entered table cannot
    // hide a transposed row
    val candidates =
      (1 to 8).map(dx => (dx, 0)) ++
        (for (dy <- 1 to 7; dx <- -7 to 8) yield (dx, dy))
    val sorted = candidates.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, math.abs(dx), if (dx < 0) 1 else 0) }
    assert(sorted.size === 120)
    val w = 1000
    sorted.zipWithIndex.foreach { case ((dx, dy), i) =>
      assert(WebpPixels.planeCodeToDistance(w, i + 1) ===
        math.max(1, dy * w + dx), s"entry ${i + 1} ($dx, $dy)")
    }
  }

  test("cross-format parity: VP8L hashes bit-identically to the BMP twin " +
      "whatever the encoding dials") {
    val f = img(10)
    val bmp = ImageDedup.ImageBuild.bmp24Gray(18, 16)(f)
    val want = ImageDedup.ImagePixels.dhashOf(bmp)
    assert(want.nonEmpty)
    val variants = Seq(
      WebpBuild.vp8lGray(18, 16)(f),
      WebpBuild.vp8lGray(18, 16, subtractGreen = true)(f),
      WebpBuild.vp8lGray(18, 16, predictorMode = 11)(f),
      WebpBuild.vp8lGray(18, 16, paletted = true)(f),
      WebpBuild.vp8lGray(18, 16, backrefs = true, cacheBits = 5)(f),
      WebpBuild.vp8lGray(18, 16, crossColor = true)(f),
      WebpBuild.vp8lGray(18, 16, metaGroups = 3, metaBits = 2)(f),
      WebpBuild.vp8lGray(18, 16, paletted = true, subtractGreen = true)(f),
      WebpBuild.vp8lGray(18, 16, paletted = true, predictorMode = 11)(f),
      WebpBuild.vp8lGray(18, 16, subtractGreen = true, crossColor = true,
        predictorMode = 12, metaGroups = 2, metaBits = 2,
        backrefs = true, cacheBits = 4)(f))
    variants.foreach { v =>
      assert(ImageDedup.ImagePixels.dhashOf(v) === want)
      assert(ImageDedup.ImagePixels.decodeGrayReason(v).isRight)
    }
  }

  test("reason classes: lossy/extended unsupported, truncation corrupt, " +
      "huge dims oversized") {
    import graft.operators.Multimodal
    // lossy VP8 frame: probe parses it, pixel path routes out
    val lossy = WebpBuild.lossyHeader(640, 480)
    assert(WebpPixels.decodeGray(lossy) === Left("unsupported"))
    assert(Multimodal.MediaDecoder.contentReason(lossy) === "unsupported")
    // VP8X header with NO image chunk (MediaBuild's header-only probe
    // fixture): the spec mandates an image chunk — corrupt, not
    // unsupported, now that still VP8X containers are in scope (r13)
    assert(WebpPixels.decodeGray(
      Multimodal.MediaBuild.webp(64, 48)) === Left("corrupt"))
    val good = WebpBuild.vp8lGray(18, 16)(img(11))
    assert(Multimodal.MediaDecoder.contentReason(good) === "ok")
    // truncations: never throw; and (away from the final pad/flush
    // bytes, which may carry no load-bearing bits) never Right
    for (n <- 0 until good.length - 2)
      assert(WebpPixels.decodeGray(good.take(n)).isLeft, s"take($n)")
    WebpPixels.decodeGray(good.take(good.length - 1))
    WebpPixels.decodeGray(good.take(good.length - 2))
    // nonzero version: future format, route out not drop
    val plain = WebpBuild.vp8lGray(18, 16)(img(11))
    val ver = plain.clone
    // version = bits 29..31 of the 32-bit header word = top 3 bits of
    // byte 24 (file offset 21+3)
    ver(24) = (ver(24) | 0x20).toByte
    assert(WebpPixels.decodeGray(ver) === Left("unsupported"))
    // dims past the 2^24 pixel cap: 8192x8192 claimed on a tiny body
    val huge = plain.clone
    // width-1 / height-1 are 14-bit LSB-first at bits 0..27 of bytes
    // 21..24: set both to 8191 (0x1FFF)
    huge(21) = 0xff.toByte
    huge(22) = (0x1f | ((8191 & 0x3) << 6)).toByte
    huge(23) = ((8191 >> 2) & 0xff).toByte
    huge(24) = ((huge(24) & 0xf0) | ((8191 >> 10) & 0x0f)).toByte
    assert(WebpPixels.decodeGray(huge) === Left("oversized"))
    // garbage behind the magic
    val junk = "RIFF????WEBP but not actually a chunk".getBytes("US-ASCII")
    assert(WebpPixels.decodeGray(junk) === Left("corrupt"))
  }

  test("randomized dial/image property: 120 random (dims, transform, " +
      "cache, backref) combinations all roundtrip exactly") {
    val rnd = new scala.util.Random(0x7eb1)
    for (trial <- 1 to 120) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val paletted = rnd.nextBoolean()
      val mod = if (paletted) Seq(2, 4, 16, 200)(rnd.nextInt(4)) else 256
      val img = Array.fill(h, w)(rnd.nextInt(mod))
      // runs make backrefs fire sometimes
      if (rnd.nextBoolean() && w > 3)
        for (y <- 0 until h; x <- 1 until w if x % 7 != 0)
          img(y)(x) = img(y)(x - 1)
      // meta-Huffman needs the (tx+ty)%n pattern to reach every group
      val metaCap = ((w + 3) >> 2) + ((h + 3) >> 2) - 1
      val metaGroups =
        if (paletted || rnd.nextBoolean()) 1
        else 1 + rnd.nextInt(math.min(4, metaCap))
      // r14: palette composes with ONE of SG / predictor
      val palCompanion = if (paletted) rnd.nextInt(3) else -1
      val bytes = WebpBuild.vp8lGray(w, h,
        subtractGreen =
          if (paletted) palCompanion == 1 else rnd.nextBoolean(),
        predictorMode =
          if (paletted) (if (palCompanion == 2) rnd.nextInt(16) else -1)
          else rnd.nextInt(17) - 1,
        paletted = paletted,
        backrefs = rnd.nextBoolean(),
        cacheBits = rnd.nextInt(8),
        mapDistances = rnd.nextBoolean(),
        crossColor = !paletted && rnd.nextBoolean(),
        metaGroups = metaGroups, metaBits = 2)((x, y) => img(y)(x))
      assert(decode(bytes) === ((w, h,
        Array.tabulate(h, w)((y, x) => img(y)(x)).flatten.toSeq)),
        s"trial $trial ${w}x$h paletted=$paletted")
    }
  }

  test("r12 review pins: chunk-size Int overflow stays corrupt (never " +
      "throws), VP8X-then-VP8L routes unsupported, and BOTH transform " +
      "read orders decode (inverses run in reverse read order)") {
    // a chunk declaring size 0x7FFFFFEC: 'at + 8 + size' wraps in Int
    // arithmetic past the bounds check and used to index negative
    val overflow = ("RIFF" + "    " + "WEBP" +
      "XXXX").getBytes("US-ASCII") ++
      Array[Byte](0xec.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte) ++
      Array.fill[Byte](16)(0)
    assert(WebpPixels.decodeGray(overflow) === Left("corrupt"))
    // VP8X extended container with a trailing VP8L chunk (the shape a
    // lossless-with-metadata writer emits): r13 — DECODES when the
    // canvas matches the image chunk (the r12 wholesale route-out is
    // gone); the hand-spliced container here is exactly that shape
    val vp8l = WebpBuild.vp8lGray(18, 16)(img(13))
    val vp8x = graft.operators.Multimodal.MediaBuild.webp(18, 16)
    val combined = {
      val chunks = vp8x.drop(12) ++ vp8l.drop(12) // both chunk lists
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      val size = 4 + chunks.length
      out.write(size & 0xff); out.write((size >> 8) & 0xff)
      out.write((size >> 16) & 0xff); out.write((size >> 24) & 0xff)
      out.write("WEBP".getBytes("US-ASCII"))
      out.write(chunks)
      out.toByteArray
    }
    assert(decode(combined) === decode(vp8l))
    // reverse transform order: stream reads [predictor, subtract-green]
    // -> the decoder must add green FIRST, then invert the predictor
    // (the two do not commute); pinned for a mode where avg2/clip are
    // genuinely non-linear
    val f = img(14)
    for (mode <- Seq(5, 11, 12, 13)) {
      val pFirst = WebpBuild.vp8lGray(21, 19, subtractGreen = true,
        predictorMode = mode, predictorFirst = true)(f)
      assert(decode(pFirst) === ((21, 19, expect(21, 19, f))),
        s"predictorFirst mode $mode")
      // and the two orders are genuinely different wire bytes
      assert(!java.util.Arrays.equals(pFirst,
        WebpBuild.vp8lGray(21, 19, subtractGreen = true,
          predictorMode = mode)(f)), s"orders collapsed, mode $mode")
    }
  }

  test("single-byte mutations of a valid VP8L payload never throw") {
    val rnd = new scala.util.Random(0xeb91)
    val base = WebpBuild.vp8lGray(18, 16, backrefs = true, cacheBits = 4)(
      (x, y) => if ((x + y) % 3 == 0) 10 else img(12)(x, y) % 32)
    for (_ <- 1 to 4000) {
      val m = base.clone
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WebpPixels.decodeGray(m) // must not throw
    }
    // same discipline over the r13 features: meta groups + cross-color
    val rich = WebpBuild.vp8lGray(24, 20, metaGroups = 3, metaBits = 2,
      crossColor = true, subtractGreen = true, backrefs = true,
      cacheBits = 4)(
      (x, y) => if ((x + y) % 3 == 0) 10 else img(15)(x, y) % 32)
    for (_ <- 1 to 4000) {
      val m = rich.clone
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WebpPixels.decodeGray(m) // must not throw
    }
    // r14: palette composed with the predictor (packed-width regime)
    val palPred = WebpBuild.vp8lGray(24, 20, paletted = true,
      predictorMode = 11)((x, y) => img(16)(x, y) % 16)
    for (_ <- 1 to 4000) {
      val m = palPred.clone
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WebpPixels.decodeGray(m) // must not throw
    }
  }
}
