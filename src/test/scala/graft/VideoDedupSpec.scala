package graft

import org.apache.spark.sql.functions.{col, lit}

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

  test("GIF decode: rejects non-GIF, truncation, out-of-canvas frames") {
    val good = gifOf(Seq(rndFrame(new scala.util.Random(4))))
    assert(GifPixels.decodeFrames("not a gif".getBytes).isEmpty)
    assert(GifPixels.decodeFrames(good.take(20)).isEmpty)
    assert(GifPixels.decodeFrames(good.dropRight(1)).isEmpty) // no trailer
    // image descriptor starts after 13-byte header + 768-byte GCT
    val descOff = 13 + 768
    assert(good(descOff) === 0x2c.toByte)
    val offs = good.clone
    offs(descOff + 1) = 1 // left = 1 while fw = sw → frame exceeds canvas
    assert(GifPixels.decodeFrames(offs).isEmpty)
    assert(GifPixels.decodeReason(offs) === "corrupt")
    val badLzw = good.clone
    badLzw(descOff + 12) = 0xff.toByte // stomp LZW bytes
    badLzw(descOff + 13) = 0xff.toByte
    assert(GifPixels.decodeFrames(badLzw).isEmpty ||
      GifPixels.decodeFrames(badLzw).nonEmpty) // None or a decode — never a throw
    // the interlace FLAG alone no longer rejects: toggling it on a
    // sequentially-stored file decodes to a row permutation (same
    // multiset of pixels, reordered rows)
    val inter = good.clone
    inter(descOff + 9) = 0x40.toByte
    val viaFlag = GifPixels.decodeFrames(inter)
    val viaSeq = GifPixels.decodeFrames(good)
    assert(viaFlag.nonEmpty)
    assert(viaFlag.get.head.luma.sorted.toSeq ===
      viaSeq.get.head.luma.sorted.toSeq)
  }

  test("GIF interlace: four-pass row reordering reproduces exact pixels") {
    // row index mapping is a permutation for every height
    for (fh <- 1 to 40) {
      val rows = (0 until fh).map(r => GifPixels.interlaceRow(r, fh))
      assert(rows.sorted === (0 until fh).toVector, s"fh=$fh: $rows")
    }
    // an interlaced build decodes pixel-identical to the sequential one
    val f = rndFrame(new scala.util.Random(8), w = 21, h = 19)
    val seqGif = GifBuild.animatedFrames(21, 19,
      Seq(GifBuild.FrameSpec(0, 0, 21, 19, (x, y) => f(y)(x))))
    val intGif = GifBuild.animatedFrames(21, 19,
      Seq(GifBuild.FrameSpec(0, 0, 21, 19, (x, y) => f(y)(x),
        interlaced = true)))
    assert(GifPixels.decodeFrames(intGif).get.head.luma.toSeq ===
      GifPixels.decodeFrames(seqGif).get.head.luma.toSeq)
    assert(GifPixels.decodeFrames(intGif).get.head.luma.toSeq ===
      f.flatten.toSeq)
  }

  test("GIF compositing: delta frames reproduce the full-frame result") {
    // full-frame animation vs its delta encoding (frame 2 ships only
    // the changed rect, do-not-dispose): pixel-identical composites
    val rnd = new scala.util.Random(9)
    val a = rndFrame(rnd) // 18x16
    val b = a.map(_.clone)
    for (y <- 5 until 9; x <- 3 until 11) b(y)(x) = 1 + rnd.nextInt(200)
    val full = gifOf(Seq(a, b))
    val delta = GifBuild.animatedFrames(18, 16, Seq(
      GifBuild.FrameSpec(0, 0, 18, 16, (x, y) => a(y)(x), disposal = 1),
      GifBuild.FrameSpec(3, 5, 8, 4, (x, y) => b(y + 5)(x + 3))))
    val viaFull = GifPixels.decodeFrames(full).get
    val viaDelta = GifPixels.decodeFrames(delta).get
    assert(viaDelta.size === 2)
    assert(viaDelta(0).luma.toSeq === viaFull(0).luma.toSeq)
    assert(viaDelta(1).luma.toSeq === viaFull(1).luma.toSeq)
    // and the temporal-mean hash agrees between the two encodings
    assert(GifPixels.avgHashOf(delta) === GifPixels.avgHashOf(full))
  }

  test("GIF compositing: transparency holds the previous canvas pixels") {
    val rnd = new scala.util.Random(10)
    val a = rndFrame(rnd)
    val b = a.map(_.clone)
    for (y <- 0 until 4; x <- 0 until 6) b(y)(x) = 1 + rnd.nextInt(200)
    // frame 2 covers the canvas but marks everything OUTSIDE the
    // changed rect transparent (index 0 is never used by rndFrame's
    // [1,200] values, so it is free for transparency)
    val trans = GifBuild.animatedFrames(18, 16, Seq(
      GifBuild.FrameSpec(0, 0, 18, 16, (x, y) => a(y)(x), disposal = 1),
      GifBuild.FrameSpec(0, 0, 18, 16,
        (x, y) => if (y < 4 && x < 6) b(y)(x) else 0, transIdx = 0)))
    val frames = GifPixels.decodeFrames(trans).get
    assert(frames(1).luma.toSeq === b.flatten.toSeq,
      "transparent pixels must hold frame 1's content")
  }

  test("GIF compositing: restore-background and restore-previous disposal") {
    val base = Array.tabulate(16, 18)((y, x) => 10 + ((x + y) % 100))
    // disposal 2: after frame 1 shows base, its rect resets to the
    // background color (index 7 → luma 7 under the identity palette);
    // frame 2 is a tiny opaque patch, so the rest of the canvas shows
    // the restored background, not frame 1
    val d2 = GifBuild.animatedFrames(18, 16, Seq(
      GifBuild.FrameSpec(0, 0, 18, 16, (x, y) => base(y)(x), disposal = 2),
      GifBuild.FrameSpec(0, 0, 2, 2, (_, _) => 99)), bgIndex = 7)
    val f2 = GifPixels.decodeFrames(d2).get
    assert(f2(0).luma.toSeq === base.flatten.toSeq)
    val want2 = Array.tabulate(16, 18)((y, x) =>
      if (y < 2 && x < 2) 99 else 7).flatten.toSeq
    assert(f2(1).luma.toSeq === want2)
    // disposal 3: frame 2 (restore-previous) paints a patch; frame 3
    // is fully transparent → composites over the RESTORED frame-1
    // canvas, as if frame 2 never happened
    val d3 = GifBuild.animatedFrames(18, 16, Seq(
      GifBuild.FrameSpec(0, 0, 18, 16, (x, y) => base(y)(x), disposal = 1),
      GifBuild.FrameSpec(4, 4, 3, 3, (_, _) => 199, disposal = 3),
      GifBuild.FrameSpec(0, 0, 1, 1, (_, _) => 0, transIdx = 0)))
    val f3 = GifPixels.decodeFrames(d3).get
    assert(f3(1).luma(5 * 18 + 5) === 199, "frame 2 shows the patch")
    assert(f3(2).luma.toSeq === base.flatten.toSeq,
      "restore-previous must erase frame 2 under frame 3")
  }

  test("GIF decodeReason: ok / corrupt / oversized are distinguishable") {
    val good = gifOf(Seq(rndFrame(new scala.util.Random(11))))
    assert(GifPixels.decodeReason(good) === "ok")
    assert(GifPixels.decodeReason(good.dropRight(1)) === "corrupt")
    // huge claimed canvas on a tiny payload: a policy bound, not
    // structural corruption
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes); le16(16000); le16(16000)
    out.write(0); out.write(0); out.write(0); out.write(0x3b)
    assert(GifPixels.decodeReason(out.toByteArray) === "oversized")
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

  test("orderedNearDupPairs: brute-force q-gram Jaccard parity (r11)") {
    val rnd = new scala.util.Random(8)
    // a pool of distinct frames composed into clips with shared,
    // reordered, perturbed and partially-overlapping orders
    val pool = Vector.fill(6)(rndFrame(rnd))
    def clip(ix: Int*): Array[Byte] = gifOf(ix.map(pool))
    val vids = Seq[(Long, Array[Byte])](
      (1L, clip(0, 1, 2, 3)),
      (2L, clip(0, 1, 2, 3)),                      // exact copy → 1.0
      (3L, clip(3, 2, 1, 0)),                      // reversed → 0
      (4L, clip(0, 1, 2, 4)),                      // 2/4 grams → 0.5
      (5L, gifOf(Seq(pool(0).map(_.map(_ + 12)),   // brightness copy,
        pool(1).map(_.map(_ + 12)),                // same order → 1.0
        pool(2).map(_.map(_ + 12)),
        pool(3).map(_.map(_ + 12)))))
        ,
      (6L, clip(5)),                               // < q frames: skipped
      (7L, "not a gif at all".getBytes("UTF-8")))  // no video path
    val q = 2
    // brute force over positional frame-hash tuples
    val gramSets = vids.flatMap { case (id, p) =>
      GifPixels.frameHashesOf(p).collect {
        case hs if hs.length >= q =>
          id -> hs.sliding(q).map(_.toVector).toSet
      }
    }
    val want = (for {
      Seq((a, ga), (b, gb)) <- gramSets.sortBy(_._1).combinations(2)
      inter = (ga & gb).size
      j = inter.toDouble / (ga.size + gb.size - inter) if j >= 0.5
    } yield (a, b, j)).toSet
    val got = VideoDedup.orderedNearDupPairs(
        vids.toDF("id", "payload").repartition(4), "id", "payload",
        q = q, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want)
    // the planted semantics, stated explicitly
    val pairs = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) === 1.0, "exact copy")
    assert(pairs((1L, 5L)) === 1.0, "same-order brightness copy")
    assert(pairs((1L, 4L)) === 0.5, "3-frame overlap")
    assert(!pairs.contains((1L, 3L)), "reversed cut must NOT pair")
    assert(!got.exists(t => t._1 === 6L || t._2 === 6L), "short clip")
    assert(!got.exists(t => t._1 === 7L || t._2 === 7L), "non-video")
    // ...while the order-INSENSITIVE mean hash pairs the reversed cut
    val meanPairs = VideoDedup.nearDupPairs(
        vids.toDF("id", "payload"), "id", "payload", 3, 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(meanPairs.contains((1L, 3L, 0)), "mean hash catches reorder")
  }

  test("bothFormsPairs (r13): one decode, bit-identical to the two " +
      "separate operators, and the both-hashes accumulation matches " +
      "the separate evaluators on every payload") {
    val rnd = new scala.util.Random(9)
    val pool = Vector.fill(6)(rndFrame(rnd))
    def clip(ix: Int*): Array[Byte] = gifOf(ix.map(pool))
    val vids = Seq[(Long, Array[Byte])](
      (1L, clip(0, 1, 2, 3)),
      (2L, clip(0, 1, 2, 3)),
      (3L, clip(3, 2, 1, 0)),
      (4L, clip(0, 1, 2, 4)),
      (5L, clip(5)),
      (6L, "not a gif at all".getBytes("UTF-8")))
    // evaluator parity: bothHashesOf == (avgHashOf, frameHashesOf)
    vids.foreach { case (id, p) =>
      assert(VideoDedup.bothHashesOf(p) ===
        VideoDedup.avgHashOf(p).map(a =>
          (a, VideoDedup.frameHashesOf(p).get)), s"payload $id")
    }
    // operator parity: the fused pairs equal the union of the two
    // separate operators' pairs (the q111 gate shape)
    val df = vids.toDF("id", "payload").repartition(4)
    val want =
      VideoDedup.nearDupPairs(df, "id", "payload", 3, 4)
        .select(col("id_a"), col("id_b"), lit("mean").as("form"),
          col("hamming").cast("double").as("score"))
        .unionByName(
          VideoDedup.orderedNearDupPairs(df, "id", "payload", 2, 0.5)
            .select(col("id_a"), col("id_b"), lit("ordered").as("form"),
              col("jaccard").as("score")))
        .as[(Long, Long, String, Double)].collect().toSet
    val got = VideoDedup.bothFormsPairs(df, "id", "payload",
        maxHamming = 3, bands = 4, q = 2, minJaccard = 0.5)
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got === want)
    assert(got.exists(_._3 == "mean") && got.exists(_._3 == "ordered"))
    // the fused plan carries exactly ONE decode expression
    val plan = VideoDedup.bothFormsPairs(df, "id", "payload")
      .queryExecution.analyzed.toString
    assert(!plan.toLowerCase.contains("videoavghash") &&
      !plan.toLowerCase.contains("videoframehashes"),
      "fused path must not fall back to the separate decodes")
  }

  test("orderedNearDupPairs rejects non-integral id columns loudly") {
    intercept[IllegalArgumentException] {
      VideoDedup.orderedNearDupPairs(
        Seq(("uuid-1", Array[Byte](1))).toDF("id", "payload"),
        "id", "payload")
    }
  }
}
