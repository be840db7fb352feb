package graft

import org.apache.spark.sql.functions._

import graft.operators.ImageDedup
import graft.operators.ImageDedup.{ImageBuild, ImagePixels}

class ImageDedupSpec extends SparkSuite {
  import spark.implicits._

  private def randImg(rnd: scala.util.Random, w: Int = 18, h: Int = 16)
      : Array[Array[Int]] =
    Array.fill(h, w)(1 + rnd.nextInt(200))

  private def bmpOf(img: Array[Array[Int]], topDown: Boolean = false)
      : Array[Byte] =
    ImageBuild.bmp24Gray(img.head.length, img.length, topDown)(
      (x, y) => img(y)(x))

  // --- decode ---------------------------------------------------------

  test("BMP decode: exact pixels, both row orders, padded strides") {
    // w=3 → 9-byte rows padded to 12: the padding path must be exact
    val img = Array(Array(10, 20, 30), Array(40, 50, 60))
    for (topDown <- Seq(false, true)) {
      val Some((w, h, pix)) = ImagePixels.decodeGray(bmpOf(img, topDown))
      assert((w, h) === ((3, 2)))
      assert(pix.toSeq === Seq(10, 20, 30, 40, 50, 60),
        s"topDown=$topDown")
    }
  }

  test("BMP decode: luma is exact for gray and BT.601 for color") {
    // hand-build one 1x1 color BMP: b=10 g=20 r=30 → (77*30+150*20+29*10)>>8
    val p = ImageBuild.bmp24Gray(1, 1)((_, _) => 0)
    p(54) = 10.toByte; p(55) = 20.toByte; p(56) = 30.toByte
    val Some((_, _, pix)) = ImagePixels.decodeGray(p)
    assert(pix(0) === ((77 * 30 + 150 * 20 + 29 * 10) >> 8))
  }

  test("BMP decode: crafted overflow headers land in None, never throw") {
    def le32(arr: Array[Byte], i: Int, v: Int): Unit = {
      arr(i) = (v & 0xff).toByte; arr(i + 1) = ((v >> 8) & 0xff).toByte
      arr(i + 2) = ((v >> 16) & 0xff).toByte
      arr(i + 3) = ((v >> 24) & 0xff).toByte
    }
    val base = bmpOf(Array(Array(1, 2), Array(3, 4)))
    val hugeW = base.clone; le32(hugeW, 18, 0x40000000) // 3*w+3 wraps
    assert(ImagePixels.decodeGray(hugeW).isEmpty)
    val minH = base.clone; le32(minH, 22, Int.MinValue) // abs stays < 0
    assert(ImagePixels.decodeGray(minH).isEmpty)
    val hugeHdr = base.clone; le32(hugeHdr, 14, Int.MaxValue - 2)
    assert(ImagePixels.decodeGray(hugeHdr).isEmpty)
    val negOff = base.clone; le32(negOff, 10, -8)
    assert(ImagePixels.decodeGray(negOff).isEmpty)
    val bigWH = base.clone // plausible w,h whose pixel data can't fit
    le32(bigWH, 18, 1 << 19); le32(bigWH, 22, 1 << 19)
    assert(ImagePixels.decodeGray(bigWH).isEmpty)
  }

  test("nearDupPairs rejects non-integral id columns loudly") {
    intercept[IllegalArgumentException] {
      ImageDedup.nearDupPairs(
        Seq(("uuid-1", Array[Byte](1))).toDF("id", "payload"),
        "id", "payload")
    }
  }

  test("BMP decode rejects non-BMP, truncated, compressed, non-24bpp") {
    val good = bmpOf(randImg(new scala.util.Random(1)))
    assert(ImagePixels.decodeGray("not an image".getBytes).isEmpty)
    assert(ImagePixels.decodeGray(good.take(40)).isEmpty)
    assert(ImagePixels.decodeGray(good.take(100)).isEmpty) // pixel rows cut
    val comp = good.clone; comp(30) = 1 // biCompression = BI_RLE8
    assert(ImagePixels.decodeGray(comp).isEmpty)
    val bpp = good.clone; bpp(28) = 8 // 8-bit palette
    assert(ImagePixels.decodeGray(bpp).isEmpty)
    val magic = good.clone; magic(0) = 'X'.toByte
    assert(ImagePixels.decodeGray(magic).isEmpty)
  }

  // --- hashes ---------------------------------------------------------

  // --- PNG pixel path (r10) --------------------------------------------

  test("PNG decode: pixel-exact vs BMP across color types and filters") {
    val rnd = new scala.util.Random(41)
    for (colorType <- Seq(0, 2, 4, 6); filterMode <- 0 to 5) {
      val img = randImg(rnd)
      val png = ImageBuild.pngGray(18, 16, colorType,
        filterOf = y => if (filterMode == 5) y % 5 else filterMode)(
        (x, y) => img(y)(x))
      val Right((w, h, luma)) = ImageDedup.PngPixels.decodeGray(png)
      assert((w, h) === ((18, 16)), s"ct=$colorType f=$filterMode")
      assert(luma.toSeq === img.flatten.toSeq,
        s"ct=$colorType f=$filterMode: pixels differ")
      // two independent decode paths, one fingerprint
      assert(ImagePixels.dhashOf(png) === ImagePixels.dhashOf(bmpOf(img)),
        s"ct=$colorType f=$filterMode: dHash differs from BMP")
      assert(ImagePixels.ahashOf(png) === ImagePixels.ahashOf(bmpOf(img)))
    }
  }

  test("PNG decode: full static matrix — depths, palette, Adam7 (r11)") {
    val rnd = new scala.util.Random(44)
    val combos = Seq((0, 1), (0, 2), (0, 4), (0, 8), (0, 16), (2, 8),
      (2, 16), (3, 1), (3, 2), (3, 4), (3, 8), (4, 8), (4, 16), (6, 8),
      (6, 16))
    for ((ct, d) <- combos; inter <- Seq(false, true)) {
      val w = 18; val h = 16
      val maxV = if (d < 8) (1 << d) - 1 else 255
      val img = Array.fill(h, w)(rnd.nextInt(maxV + 1))
      val png = ImageBuild.pngGray(w, h, ct, d, inter,
        filterOf = y => y % 5)((x, y) => img(y)(x))
      val Right((dw, dh, luma)) = ImageDedup.PngPixels.decodeGray(png)
      assert((dw, dh) === ((w, h)), s"ct=$ct d=$d i=$inter")
      // identity luma for byte+ depths, 255/(2^d-1) scaling below
      def scaled(v: Int): Int = if (d >= 8) v else v * 255 / ((1 << d) - 1)
      assert(luma.toSeq === img.flatten.toSeq.map(scaled),
        s"ct=$ct d=$d i=$inter: pixels differ")
      // cross-path: the equivalent BMP yields the identical fingerprint
      val bmpImg = img.map(_.map(scaled))
      assert(ImagePixels.dhashOf(png) === ImagePixels.dhashOf(bmpOf(bmpImg)),
        s"ct=$ct d=$d i=$inter: dHash differs from BMP")
      assert(ImagePixels.ahashOf(png) === ImagePixels.ahashOf(bmpOf(bmpImg)),
        s"ct=$ct d=$d i=$inter: aHash differs from BMP")
    }
  }

  test("PNG Adam7: every size 1..9 deinterlaces to the sequential image") {
    // small canvases hit every empty-pass configuration of the 7-pass
    // grid; filters vary by image row so pass-local filtering is real
    for (w <- 1 to 9; h <- 1 to 9) {
      val img = Array.tabulate(h, w)((y, x) => (x * 37 + y * 11) % 256)
      val seq = ImageBuild.pngGray(w, h)((x, y) => img(y)(x))
      val adam = ImageBuild.pngGray(w, h, interlace = true,
        filterOf = y => (y + 1) % 5)((x, y) => img(y)(x))
      assert(ImageDedup.PngPixels.decodeGray(adam)
          .map(r => (r._1, r._2, r._3.toSeq)) ===
        ImageDedup.PngPixels.decodeGray(seq)
          .map(r => (r._1, r._2, r._3.toSeq)), s"$w x $h")
      assert(ImageDedup.PngPixels.decodeGray(seq).map(_._3.toSeq) ===
        Right(img.flatten.toSeq), s"$w x $h sequential")
    }
  }

  test("PNG decode: wide image crossing the deflate buffer round-trips") {
    val rnd = new scala.util.Random(42)
    val img = randImg(rnd, w = 200, h = 90) // 54KB RGB raw, multi-block
    val png = ImageBuild.pngGray(200, 90, colorType = 2,
      filterOf = y => (y * 7) % 5)((x, y) => img(y)(x))
    val Right((_, _, luma)) = ImageDedup.PngPixels.decodeGray(png)
    assert(luma.toSeq === img.flatten.toSeq)
  }

  test("PNG decodeGrayReason: corrupt / unsupported / oversized classes") {
    val img = randImg(new scala.util.Random(43))
    val good = ImageBuild.pngGray(18, 16)((x, y) => img(y)(x))
    assert(ImagePixels.decodeGrayReason(good).isRight)
    // truncation and stream damage → corrupt
    assert(ImageDedup.PngPixels.decodeGray(good.take(30)) ===
      Left("corrupt"))
    val bad = good.clone
    bad(good.length - 20) = (bad(good.length - 20) ^ 0x55).toByte
    assert(ImageDedup.PngPixels.decodeGray(bad).isLeft ||
      ImageDedup.PngPixels.decodeGray(bad).isRight) // never throws
    // flag-flipped headers now claim a layout the stream does not
    // carry — structural mismatch, so "corrupt" (since r11 every legal
    // static PNG layout decodes; "unsupported" no longer exists for
    // PNG)
    val adam = good.clone
    adam(28) = 1 // Adam7 flag over a sequential stream: length mismatch
    assert(ImageDedup.PngPixels.decodeGray(adam) === Left("corrupt"))
    val pal = good.clone
    pal(25) = 3 // palette type without a PLTE chunk
    assert(ImageDedup.PngPixels.decodeGray(pal) === Left("corrupt"))
    val deep = good.clone
    deep(24) = 16 // 16-bit claim: stream is half the implied size
    assert(ImageDedup.PngPixels.decodeGray(deep) === Left("corrupt"))
    val badCombo = good.clone
    badCombo(24) = 4; badCombo(25) = 2 // RGB at depth 4: illegal combo
    assert(ImageDedup.PngPixels.decodeGray(badCombo) === Left("corrupt"))
    // huge claimed dimensions on a tiny body → oversized, refused
    // BEFORE the raw-buffer allocation
    val huge = good.clone
    huge(16) = 0; huge(17) = 0x20.toByte; huge(18) = 0; huge(19) = 0
    // width = 0x00200000 = 2M > MaxDim
    assert(ImageDedup.PngPixels.decodeGray(huge) === Left("oversized"))
    // plausible dims the IDAT cannot possibly inflate to (1032x bound)
    val wide = good.clone
    // width := 4096, height := 4000 → raw ~49 MB vs ~600-byte IDAT
    wide(16) = 0; wide(17) = 0; wide(18) = 0x10.toByte; wide(19) = 0
    wide(20) = 0; wide(21) = 0; wide(22) = 0x0f.toByte; wide(23) = 0xa0.toByte
    assert(ImageDedup.PngPixels.decodeGray(wide) === Left("oversized"))
    // no magic at all
    assert(ImagePixels.decodeGrayReason("plain text".getBytes) ===
      Left("unrecognized"))
  }

  test("nearDupPairs blocks PNG and BMP encodings of one image together") {
    val rnd = new scala.util.Random(44)
    val rows = (0 until 12).flatMap { i =>
      val img = randImg(rnd)
      Seq((i.toLong, bmpOf(img)),
        (100L + i, ImageBuild.pngGray(18, 16, colorType = 2,
          filterOf = y => y % 5)((x, y) => img(y)(x))))
    }
    val got = ImageDedup.nearDupPairs(
        rows.toDF("id", "payload").repartition(4), "id", "payload")
      .as[(Long, Long, Int)].collect().toSet
    // each BMP pairs with its PNG twin at hamming 0; distinct images
    // (independent random patterns) stay apart
    assert(got === (0 until 12).map(i => (i.toLong, 100L + i, 0)).toSet)
  }

  private def dhashDirect(img: Array[Array[Int]]): Long = {
    val Some((w, h, pix)) = ImagePixels.decodeGray(bmpOf(img))
    ImagePixels.dhash64(ImagePixels.grid(pix, w, h, 9, 8))
  }

  test("dHash/aHash: invariant to pixel-replication scaling (2x, 3x)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      // 72 = lcm(9, 8): BOTH hash grids align, so scaling is exact for
      // dHash (9x8) and aHash (8x8) alike
      val img = randImg(rnd, w = 72, h = 16)
      def scaled(k: Int): Array[Array[Int]] =
        Array.tabulate(16 * k, 72 * k)((y, x) => img(y / k)(x / k))
      for (k <- Seq(2, 3)) {
        assert(ImagePixels.dhashOf(bmpOf(scaled(k))).get ===
          ImagePixels.dhashOf(bmpOf(img)).get, s"dhash k=$k")
        assert(ImagePixels.ahashOf(bmpOf(scaled(k))).get ===
          ImagePixels.ahashOf(bmpOf(img)).get, s"ahash k=$k")
      }
    }
  }

  test("dHash/aHash: invariant to uniform brightness shift (no clamp)") {
    val rnd = new scala.util.Random(8)
    for (shift <- Seq(-1, 16, 40)) {
      val img = randImg(rnd).map(_.map(v => math.min(v, 200)))
      val shifted = img.map(_.map(_ + shift + 1)) // keep >= 1
      assert(ImagePixels.dhashOf(bmpOf(shifted)).get ===
        ImagePixels.dhashOf(bmpOf(img.map(_.map(_ + 1)))).get)
      assert(ImagePixels.ahashOf(bmpOf(shifted)).get ===
        ImagePixels.ahashOf(bmpOf(img.map(_.map(_ + 1)))).get)
    }
  }

  test("dHash: top-down and bottom-up encodings of one image agree") {
    val img = randImg(new scala.util.Random(9))
    assert(ImagePixels.dhashOf(bmpOf(img, topDown = true)).get ===
      ImagePixels.dhashOf(bmpOf(img, topDown = false)).get)
  }

  test("dHash: one perturbed grid cell flips at most 2 bits") {
    val rnd = new scala.util.Random(10)
    val img = randImg(rnd)
    val h0 = dhashDirect(img)
    // flip cell (3, 4): pixels y in [6,8), x in [8,10)
    val pert = img.map(_.clone)
    for (y <- 6 until 8; x <- 8 until 10) pert(y)(x) = 201 - pert(y)(x)
    val h1 = dhashDirect(pert)
    val d = java.lang.Long.bitCount(h0 ^ h1)
    assert(d >= 1 && d <= 2, s"hamming $d")
  }

  test("dHash: non-grid-aligned sizes still decode and hash (w < 9)") {
    // degenerate tiny image: grid blocks clamp to >= 1 px, no crash
    val img = Array.fill(3, 4)(5)
    assert(ImagePixels.dhashOf(bmpOf(img)).isDefined)
  }

  // --- nearDupPairs ---------------------------------------------------

  test("nearDupPairs: exact parity with brute force at maxHamming < bands") {
    val rnd = new scala.util.Random(11)
    // 60 random bases + perturbed copies at various distances + exact
    // dups: the band join must find EXACTLY the brute-force <= 3 set
    val imgs = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    for (i <- 0 until 60) {
      val img = randImg(rnd)
      imgs += ((i.toLong, bmpOf(img)))
      if (i % 3 == 0) { // cell-perturbed copy (small, maybe >3, hamming)
        val pert = img.map(_.clone)
        val nCells = 1 + rnd.nextInt(3)
        for (_ <- 0 until nCells) {
          val (r, c) = (rnd.nextInt(8), rnd.nextInt(9))
          for (y <- 2 * r until 2 * r + 2; x <- 2 * c until 2 * c + 2)
            pert(y)(x) = 201 - pert(y)(x)
        }
        imgs += ((1000L + i, bmpOf(pert)))
      }
      if (i % 5 == 0) imgs += ((2000L + i, bmpOf(img))) // exact dup
    }
    val hashes = imgs.map { case (id, p) =>
      id -> ImagePixels.dhashOf(p).get }.toMap
    val want = (for {
      Seq((a, ha), (b, hb)) <- hashes.toSeq.sortBy(_._1).combinations(2)
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = ImageDedup.nearDupPairs(
        imgs.toSeq.toDF("id", "payload").repartition(8), "id", "payload",
        maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(want.exists(_._3 > 0), "fixture should contain nonzero-distance pairs")
  }

  test("nearDupPairs: undecodable payloads are skipped, not thrown") {
    val img = randImg(new scala.util.Random(12))
    val rows = Seq(
      (1L, bmpOf(img)), (2L, bmpOf(img)),
      (3L, "plain text bytes".getBytes),
      (4L, Array[Byte](0x42, 0x4d, 1, 2))) // BM magic, truncated
    val got = ImageDedup.nearDupPairs(
        rows.toDF("id", "payload"), "id", "payload")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 0)))
  }

  test("the decode+hash expression appears exactly once in the plan") {
    // regression pin for the predicate-pushdown double-eval trap: a
    // Filter on the aliased signature gets pushed below the projection
    // and evaluates the full decode+hash TWICE per payload; the
    // explode(when(...)) shape must keep it to one occurrence
    // a parquet-backed input: a LocalRelation fixture would be
    // constant-folded by ConvertToLocalRelation and hide the expression
    val dir = java.nio.file.Files.createTempDirectory("planpin").toString
    Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = ImageDedup.nearDupPairs(df, "id", "payload")
      .queryExecution.optimizedPlan.toString.toLowerCase
    val n = "imagedhash".r.findAllIn(plan).size
    assert(n === 1, s"expected exactly one ImageDHash in the plan, got $n")
  }

  test("nearDupPairs enforces the pigeonhole contract") {
    intercept[IllegalArgumentException] {
      ImageDedup.nearDupPairs(Seq((1L, Array[Byte](1)))
        .toDF("id", "payload"), "id", "payload", maxHamming = 4, bands = 4)
    }
  }
}
