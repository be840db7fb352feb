package graft

import graft.operators.{ImageDedup, VideoDedup}
import graft.operators.VideoDedup.{GifBuild, GifPixels}

class VideoDedupSpec extends SparkSuite {
  import spark.implicits._

  private def rndFrame(rnd: scala.util.Random, w: Int = 18, h: Int = 16)
      : Array[Array[Int]] =
    Array.fill(h, w)(1 + rnd.nextInt(200))

  private def gifOf(frames: Seq[Array[Array[Int]]]): Array[Byte] =
    GifBuild.animatedGray(frames.head.head.length, frames.head.length,
      frames.map(f => (x: Int, y: Int) => f(y)(x)))

  // --- decode ---------------------------------------------------------

  test("GIF decode: exact per-frame luma through the real LZW stream") {
    val f1 = Array(Array(0, 255, 7), Array(100, 1, 200))
    val f2 = Array(Array(9, 8, 7), Array(6, 5, 4))
    val Some(frames) = GifPixels.decodeFrames(gifOf(Seq(f1, f2)))
    assert(frames.size === 2)
    assert(frames(0).luma.toSeq === Seq(0, 255, 7, 100, 1, 200))
    assert(frames(1).luma.toSeq === Seq(9, 8, 7, 6, 5, 4))
  }

  test("GIF decode: a frame bigger than one 255-byte sub-block round-trips") {
    // 100x40 = 4000 px → ~4.5KB LZW bytes → many sub-blocks + interior
    // clear codes: exercises the block walk and dictionary resets
    val rnd = new scala.util.Random(3)
    val f = rndFrame(rnd, w = 100, h = 40)
    val Some(frames) = GifPixels.decodeFrames(gifOf(Seq(f)))
    assert(frames.head.luma.toSeq === f.flatten.toSeq)
  }

  test("GIF decode: rejects non-GIF, truncation, interlace, offset frames") {
    val good = gifOf(Seq(rndFrame(new scala.util.Random(4))))
    assert(GifPixels.decodeFrames("not a gif".getBytes).isEmpty)
    assert(GifPixels.decodeFrames(good.take(20)).isEmpty)
    assert(GifPixels.decodeFrames(good.dropRight(1)).isEmpty) // no trailer
    val inter = good.clone
    // image descriptor starts after 13-byte header + 768-byte GCT
    val descOff = 13 + 768
    assert(inter(descOff) === 0x2c.toByte)
    inter(descOff + 9) = 0x40.toByte // interlace flag
    assert(GifPixels.decodeFrames(inter).isEmpty)
    val offs = good.clone
    offs(descOff + 1) = 1 // left = 1 → not full-canvas
    assert(GifPixels.decodeFrames(offs).isEmpty)
    val badLzw = good.clone
    badLzw(descOff + 12) = 0xff.toByte // stomp LZW bytes
    badLzw(descOff + 13) = 0xff.toByte
    assert(GifPixels.decodeFrames(badLzw).isEmpty ||
      GifPixels.decodeFrames(badLzw).nonEmpty) // None or a decode — never a throw
  }

  test("crafted huge-frame headers reject before allocating (OOM guard)") {
    // a ~900-byte payload claiming a 16384x16384 frame must not try to
    // allocate the 1 GiB luma buffer
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes); le16(16384); le16(16384)
    out.write(0xf7); out.write(0); out.write(0)
    (0 until 256).foreach(c => { out.write(c); out.write(c); out.write(c) })
    out.write(0x2c); le16(0); le16(0); le16(16384); le16(16384); out.write(0)
    out.write(8); out.write(3); out.write(1); out.write(2); out.write(3)
    out.write(0); out.write(0x3b)
    assert(GifPixels.decodeFrames(out.toByteArray).isEmpty)
    // and a plausible-size frame whose LZW bytes cannot possibly
    // inflate that far (4096x bound) is rejected payload-proportionally
    val small = GifBuild.animatedGray(18, 16, Seq((_, _) => 5))
    val hacked = small.clone
    val descOff = 13 + 768
    hacked(descOff + 5) = 0; hacked(descOff + 6) = 0x10 // w := 4096
    hacked(descOff + 7) = 0; hacked(descOff + 8) = 0x10 // h := 4096
    // (also violates full-canvas, but the pixel budget fires first
    // when the screen descriptor is hacked to match)
    hacked(6) = 0; hacked(7) = 0x10; hacked(8) = 0; hacked(9) = 0x10
    assert(GifPixels.decodeFrames(hacked).isEmpty)
  }

  // --- hashes ---------------------------------------------------------

  test("frame hashes agree with the BMP dHash of the same pixels") {
    // two independent decode paths (GIF+LZW vs BMP) must land on the
    // identical fingerprint for identical pixel content
    val f = rndFrame(new scala.util.Random(5))
    val viaGif = GifPixels.frameHashesOf(gifOf(Seq(f))).get.head
    val viaBmp = ImageDedup.ImagePixels.dhashOf(
      ImageDedup.ImageBuild.bmp24Gray(18, 16)((x, y) => f(y)(x))).get
    assert(viaGif === viaBmp)
  }

  test("avg hash: invariant to frame repetition and uniform brightness") {
    val rnd = new scala.util.Random(6)
    for (_ <- 1 to 3) {
      val fs = Seq.fill(5)(rndFrame(rnd))
      val h0 = GifPixels.avgHashOf(gifOf(fs)).get
      val doubled = fs.flatMap(f => Seq(f, f))
      assert(GifPixels.avgHashOf(gifOf(doubled)).get === h0, "repeat")
      val brighter = fs.map(_.map(_.map(_ + 16)))
      assert(GifPixels.avgHashOf(gifOf(brighter)).get === h0, "brightness")
      // spatial pixel-replication upscale of every frame
      val up = fs.map(f => Array.tabulate(32, 36)((y, x) => f(y / 2)(x / 2)))
      assert(GifPixels.avgHashOf(gifOf(up)).get === h0, "upscale")
    }
  }

  // --- nearDupPairs ---------------------------------------------------

  test("nearDupPairs: exact brute-force parity; undecodables skipped") {
    val rnd = new scala.util.Random(7)
    val vids = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    for (i <- 0 until 40) {
      val fs = Seq.fill(3)(rndFrame(rnd))
      vids += ((i.toLong, gifOf(fs)))
      if (i % 3 == 0) // brightness copy at distance 0
        vids += ((1000L + i, gifOf(fs.map(_.map(_.map(_ + 10))))))
      if (i % 4 == 0) { // one perturbed frame → small distance
        val pert = fs.map(_.map(_.clone))
        for (y <- 6 until 8; x <- 8 until 10)
          pert(1)(y)(x) = 201 - pert(1)(y)(x)
        vids += ((2000L + i, gifOf(pert)))
      }
    }
    vids += ((9999L, "definitely not a gif".getBytes))
    val hashes = vids.flatMap { case (id, p) =>
      GifPixels.avgHashOf(p).map(id -> _) }.toMap
    val want = (for {
      Seq((a, ha), (b, hb)) <- hashes.toSeq.sortBy(_._1).combinations(2)
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = VideoDedup.nearDupPairs(
        vids.toSeq.toDF("id", "payload").repartition(8), "id", "payload",
        maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(want.exists(_._3 === 0), "brightness copies land at distance 0")
  }
}
