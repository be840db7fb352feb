package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import java.awt.image.BufferedImage

import graft.operators.{JpegBuild, JpegPixels, MotionJpeg, VideoDedup}
import graft.operators.MotionJpeg.{AviBuild, AviPixels}

class MotionJpegSpec extends SparkSuite {
  import spark.implicits._

  // 72×64 plants constant within each 8×8 block (the q110 exactness
  // discipline: DC-only blocks roundtrip bit-exactly under UnitQuant)
  private def cell(seed: Int, f: Int)(x: Int, y: Int): Int = {
    var z = seed * 977L + f * 72L + (y / 8) * 9 + (x / 8) + 0x9e37L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z ^= z >>> 31
    1 + java.lang.Math.floorMod(z, 200L).toInt
  }
  private def jpegFrames(seed: Int, n: Int,
      standardTables: Boolean = false,
      writeDht: Boolean = true): Seq[Array[Byte]] =
    (0 until n).map(f => JpegBuild.gray(72, 64,
      standardTables = standardTables, writeDht = writeDht)(cell(seed, f)))

  // --- decode ----------------------------------------------------------

  test("builder -> decoder roundtrip: exact pixels per frame, frame order") {
    val avi = AviBuild.mjpeg(72, 64, jpegFrames(7, 4))
    val Some(frames) = AviPixels.decodeFrames(avi)
    assert(frames.size === 4)
    for (f <- 0 until 4) {
      assert((frames(f).w, frames(f).h) === ((72, 64)))
      val want = Array.tabulate(64, 72)((y, x) => cell(7, f)(x, y)).flatten
      assert(frames(f).luma.toSeq === want.toSeq, s"frame $f")
    }
  }

  test("DHT-less frames (the MJPEG convention) decode identically to " +
      "their with-DHT twins; outside AVI they are corrupt") {
    val withDht = jpegFrames(9, 3, standardTables = true)
    val noDht = jpegFrames(9, 3, standardTables = true, writeDht = false)
    assert(noDht.head.length < withDht.head.length - 200,
      "DHT-less frames should actually lack the ~216 luma-table bytes")
    val a = AviPixels.decodeFrames(AviBuild.mjpeg(72, 64, withDht)).get
    val b = AviPixels.decodeFrames(AviBuild.mjpeg(72, 64, noDht)).get
    assert(a.map(_.luma.toSeq) === b.map(_.luma.toSeq))
    // a bare DHT-less JPEG is NOT decodable without the convention
    assert(JpegPixels.decodeGray(noDht.head) === Left("corrupt"))
    assert(JpegPixels.decodeGray(noDht.head, mjpegDefaults = true).isRight)
  }

  test("Annex-K constants match the real standard tables: an ImageIO " +
      "JPEG with its DHT stripped decodes identically under mjpegDefaults") {
    val rnd = new scala.util.Random(0xa11e)
    val bi = new BufferedImage(40, 32, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 40)
      bi.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(bi, "jpg", bos), "no jpg writer")
    val theirs = bos.toByteArray
    val stripped = stripDht(theirs)
    assert(stripped.length < theirs.length - 200, "DHT was not present?")
    val Right((fw, fh, fPix)) = JpegPixels.decodeGray(theirs)
    assert(JpegPixels.decodeGray(stripped) === Left("corrupt"))
    val Right((sw, sh, sPix)) =
      JpegPixels.decodeGray(stripped, mjpegDefaults = true)
    assert((sw, sh) === ((fw, fh)))
    assert(sPix.toSeq === fPix.toSeq)
  }

  /** Remove every DHT segment from a JPEG stream (pre-SOS marker walk;
    * from SOS on, bytes copy verbatim). */
  private def stripDht(j: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(j(0)); out.write(j(1)) // SOI
    var i = 2
    while (i + 1 < j.length) {
      assert((j(i) & 0xff) == 0xff, "marker walk desynchronized")
      val m = j(i + 1) & 0xff
      if (m == 0xda) { out.write(j, i, j.length - i); i = j.length }
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        out.write(j, i, 2); i += 2
      } else {
        val len = ((j(i + 2) & 0xff) << 8) | (j(i + 3) & 0xff)
        if (m != 0xc4) out.write(j, i, 2 + len)
        i += 2 + len
      }
    }
    out.toByteArray
  }

  test("zero-length frame chunk repeats the previous frame; a leading " +
      "drop chunk is corrupt") {
    val fs = jpegFrames(11, 2)
    val dropped = AviBuild.mjpeg(72, 64,
      Seq(fs(0), Array.emptyByteArray, fs(1)))
    val explicit = AviBuild.mjpeg(72, 64, Seq(fs(0), fs(0), fs(1)))
    val a = AviPixels.decodeFrames(dropped).get
    val b = AviPixels.decodeFrames(explicit).get
    assert(a.size === 3)
    assert(a.map(_.luma.toSeq) === b.map(_.luma.toSeq))
    assert(VideoDedup.avgHashOf(dropped) === VideoDedup.avgHashOf(explicit))
    assert(AviPixels.decodeReason(
      AviBuild.mjpeg(72, 64, Seq(Array.emptyByteArray, fs(0)))) === "corrupt")
  }

  test("deeply nested rec-LIST bomb lands in 'corrupt', never a " +
      "StackOverflowError (review regression)") {
    // hand-build movi content: 10k nested LIST('rec ') headers
    val depth = 10000
    val inner = new ByteArrayOutputStream()
    def le32(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    // innermost first: wrap repeatedly
    var payload = Array.emptyByteArray
    for (_ <- 1 to depth) {
      val o = new ByteArrayOutputStream()
      o.write("LIST".getBytes("US-ASCII"))
      le32(o, 4 + payload.length)
      o.write("rec ".getBytes("US-ASCII"))
      o.write(payload)
      payload = o.toByteArray
    }
    // graft the bomb in as the movi content of a valid AVI
    val good = AviBuild.mjpeg(72, 64, jpegFrames(41, 1))
    val moviAt = {
      var i = 12
      var found = -1
      while (found < 0) {
        val id = new String(good, i, 4, "US-ASCII")
        val sz = (good(i + 4) & 0xff) | ((good(i + 5) & 0xff) << 8) |
          ((good(i + 6) & 0xff) << 16) | ((good(i + 7) & 0xff) << 24)
        if (id == "LIST" &&
            new String(good, i + 8, 4, "US-ASCII") == "movi") found = i
        else i += 8 + sz + (sz & 1)
      }
      found
    }
    val out = new ByteArrayOutputStream()
    out.write(good, 0, moviAt)
    out.write("LIST".getBytes("US-ASCII"))
    le32(out, 4 + payload.length)
    out.write("movi".getBytes("US-ASCII"))
    out.write(payload)
    val bomb = out.toByteArray
    val riffSz = bomb.length - 8
    bomb(4) = (riffSz & 0xff).toByte; bomb(5) = ((riffSz >> 8) & 0xff).toByte
    bomb(6) = ((riffSz >> 16) & 0xff).toByte
    bomb(7) = ((riffSz >> 24) & 0xff).toByte
    assert(AviPixels.decodeReason(bomb) === "corrupt")
  }

  test("rec-LIST frame grouping decodes like the flat movi layout") {
    val fs = jpegFrames(13, 3)
    val flat = AviPixels.decodeFrames(AviBuild.mjpeg(72, 64, fs)).get
    val rec = AviPixels.decodeFrames(
      AviBuild.mjpeg(72, 64, fs, recWrap = true)).get
    assert(rec.map(_.luma.toSeq) === flat.map(_.luma.toSeq))
  }

  test("reason census: non-MJPEG codec unsupported, truncation and " +
      "geometry mismatch corrupt, huge claimed dims oversized") {
    val fs = jpegFrames(17, 2)
    val good = AviBuild.mjpeg(72, 64, fs)
    assert(AviPixels.decodeReason(good) === "ok")
    assert(AviPixels.decodeReason(
      AviBuild.mjpeg(72, 64, fs, handler = "xvid")) === "unsupported")
    assert(AviPixels.decodeReason(good.take(good.length / 2)) === "corrupt")
    // strf claims 70×64 but the frames are 72×64
    assert(AviPixels.decodeReason(AviBuild.mjpeg(70, 64, fs)) === "corrupt")
    // strf claims 8192×8192: past the frame-pixel budget, refused
    // before any frame decode
    assert(AviPixels.decodeReason(
      AviBuild.mjpeg(8192, 8192, Seq(Array[Byte](1, 2, 3)))) === "oversized")
    // a frame with an out-of-scope JPEG feature routes out, not dropped
    val twelveBit = fs.map(JpegBuild.precision12Twin)
    assert(AviPixels.decodeReason(
      AviBuild.mjpeg(72, 64, twelveBit)) === "unsupported")
  }

  // --- hashes + Spark path ---------------------------------------------

  test("cross-container parity: GIF and MJPEG-AVI of the same frames " +
      "share avgHash and frameHashes exactly") {
    val gif = VideoDedup.GifBuild.animatedGray(72, 64,
      (0 until 5).map(f => cell(23, f) _))
    val avi = AviBuild.mjpeg(72, 64, jpegFrames(23, 5))
    assert(VideoDedup.avgHashOf(gif) === VideoDedup.avgHashOf(avi))
    assert(VideoDedup.avgHashOf(avi).nonEmpty)
    assert(VideoDedup.frameHashesOf(gif) === VideoDedup.frameHashesOf(avi))
    assert(VideoDedup.frameHashesOf(avi).get.size === 5)
  }

  test("nearDupPairs over a mixed GIF/AVI population (codegen path): " +
      "brute-force parity") {
    val clips = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    for (i <- 0 until 8) {
      clips += ((i.toLong, VideoDedup.GifBuild.animatedGray(72, 64,
        (0 until 3).map(f => cell(100 + i, f) _))))
      clips += ((100L + i, AviBuild.mjpeg(72, 64,
        (0 until 3).map(f => JpegBuild.gray(72, 64)(cell(100 + i, f))))))
    }
    clips += ((999L, "not a video".getBytes))
    val hashes = clips.flatMap { case (id, p) =>
      VideoDedup.avgHashOf(p).map(id -> _) }.toMap
    val want = (for {
      Seq((a, ha), (b, hb)) <- hashes.toSeq.sortBy(_._1).combinations(2)
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = VideoDedup.nearDupPairs(
        clips.toSeq.toDF("id", "payload").repartition(4), "id", "payload",
        maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    // every cross-container twin collides at distance 0
    assert((0 until 8).forall(i => want((i.toLong, 100L + i, 0))))
  }

  test("orderedNearDupPairs discriminates re-ordered AVI cuts like GIF") {
    val fs = jpegFrames(31, 4)
    val clips = Seq(
      (1L, AviBuild.mjpeg(72, 64, fs)),
      (2L, AviBuild.mjpeg(72, 64, fs.reverse)),
      (3L, AviBuild.mjpeg(72, 64, fs)))
    val got = VideoDedup.orderedNearDupPairs(
        clips.toDF("id", "payload"), "id", "payload", q = 2,
        minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 3L, 1.0)))
  }
}
