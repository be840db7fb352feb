package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, per-partition decode stub,
  * frame sampling shape. */
class MultimodalSpec extends SparkSuite {

  test("asMedia → decodeMeta roundtrip") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((1L, "hello world"), (2L, "x" * 250)).toDF("id", "txt")
    val meta = Multimodal.decodeMeta(Multimodal.asMedia(df, "id", "txt", "audio"))
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).size_bytes === 11L)
    assert(meta(1L).kind === "audio")
    assert(meta(1L).width === 11 && meta(1L).height === 11)
    assert(meta(1L).n_frames === 1)
    assert(meta(2L).size_bytes === 250L)
    assert(meta(2L).n_frames === 3)
    assert(meta(2L).first_frame_offset === 50L)
  }

  test("real header decode: round-trip every builder at adversarial dims") {
    import Multimodal.{MediaBuild, MediaDecoder}
    // 257/258 cross a byte boundary, catching BE/LE swaps; 1×1 minimal
    for ((w, h) <- Seq((1, 1), (257, 258), (640, 480), (300, 2))) {
      assert(MediaDecoder.decodeHeader(MediaBuild.png(w, h)) ===
        Some(("png", w, h)))
      assert(MediaDecoder.decodeHeader(MediaBuild.jpeg(w, h)) ===
        Some(("jpeg", w, h)))
      assert(MediaDecoder.decodeHeader(MediaBuild.gif(w, h)) ===
        Some(("gif", w, h)))
      assert(MediaDecoder.decodeHeader(MediaBuild.bmp(w, h)) ===
        Some(("bmp", w, h)))
      assert(MediaDecoder.decodeHeader(MediaBuild.webp(w, h)) ===
        Some(("webp", w, h)))
      assert(MediaDecoder.decodeHeader(MediaBuild.tiff(w, h)) ===
        Some(("tiff", w, h)))
    }
    assert(MediaBuild.png(1, 1).length.toLong === MediaBuild.PngBytes)
    assert(MediaBuild.jpeg(1, 1).length.toLong === MediaBuild.JpegBytes)
    assert(MediaBuild.gif(1, 1).length.toLong === MediaBuild.GifBytes)
    assert(MediaBuild.bmp(1, 1).length.toLong === MediaBuild.BmpBytes)
    assert(MediaBuild.webp(1, 1).length.toLong === MediaBuild.WebpBytes)
    assert(MediaBuild.tiff(1, 1).length.toLong === MediaBuild.TiffBytes)
  }

  test("header decode: WEBP VP8L/VP8 variants and big-endian TIFF") {
    import Multimodal.MediaDecoder
    // VP8L: 0x2F then width-1 (14 bits) | height-1 (14 bits), LE-packed
    def vp8l(w: Int, h: Int): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14)
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](13, 0, 0, 0) ++
        "WEBPVP8L".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++
        Array(0x2f, bits & 0xff, (bits >> 8) & 0xff, (bits >> 16) & 0xff,
          (bits >> 24) & 0xff).map(_.toByte)
    }
    assert(MediaDecoder.decodeHeader(vp8l(257, 129)) === Some(("webp", 257, 129)))
    // lossy "VP8 ": 3-byte frame tag, 9D 01 2A sync, 14-bit LE dims
    def vp8(w: Int, h: Int): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
        "WEBPVP8 ".getBytes("US-ASCII") ++ Array[Byte](10, 0, 0, 0) ++
        Array[Byte](0, 0, 0) ++ Array(0x9d, 0x01, 0x2a).map(_.toByte) ++
        Array(w & 0xff, (w >> 8) & 0x3f, h & 0xff, (h >> 8) & 0x3f)
          .map(_.toByte)
    assert(MediaDecoder.decodeHeader(vp8(640, 481)) === Some(("webp", 640, 481)))
    // big-endian (MM) TIFF with SHORT-typed dims
    val mm = java.nio.ByteBuffer.allocate(38) // BE default
    mm.put('M'.toByte).put('M'.toByte).putShort(42.toShort).putInt(8)
    mm.putShort(2.toShort)
    // SHORT values are left-justified in the 4-byte slot (BE: hi half)
    mm.putShort(256.toShort).putShort(3.toShort).putInt(1)
      .putShort(517.toShort).putShort(0.toShort)
    mm.putShort(257.toShort).putShort(3.toShort).putInt(1)
      .putShort(263.toShort).putShort(0.toShort)
    mm.putInt(0)
    assert(MediaDecoder.decodeHeader(mm.array()) === Some(("tiff", 517, 263)))
  }

  test("corrupt containers quarantine with zeroed dims; opaque still stubs") {
    import Multimodal.{MediaBuild, MediaDecoder}
    for (fmt <- MediaBuild.Formats) {
      val p = MediaBuild.corrupt(fmt)
      assert(p.length.toLong === MediaBuild.CorruptBytes(fmt), fmt)
      assert(MediaDecoder.probe(p) === MediaDecoder.Corrupt(fmt), fmt)
      val m = MediaDecoder.decode(Multimodal.MediaRecord(9L, "image", p))
      assert(m.status === "quarantined" && m.kind === fmt, fmt)
      assert(m.width === 0 && m.height === 0 && m.n_frames === 0, fmt)
      assert(m.size_bytes === p.length.toLong, fmt)
    }
    // a parsed and an opaque record carry the right statuses
    assert(MediaDecoder.decode(Multimodal.MediaRecord(
      1L, "image", MediaBuild.png(3, 4))).status === "ok")
    assert(MediaDecoder.decode(Multimodal.MediaRecord(
      2L, "blob", "free text".getBytes)).status === "opaque")
  }

  test("header decode: JPEG marker walk skips APP/COM segments and fills") {
    import Multimodal.{MediaBuild, MediaDecoder}
    val sof = MediaBuild.jpeg(311, 207)
    // splice an APP0 (JFIF) segment and a comment between SOI and SOF0,
    // plus a fill 0xFF before the SOF marker
    val app0 = Array(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0).map(_.toByte)
    val com = Array(0xff, 0xfe, 0x00, 0x05, 'h', 'i', '!').map(_.toByte)
    val fill = Array(0xff.toByte)
    val spliced = sof.take(2) ++ app0 ++ com ++ fill ++ sof.drop(2)
    assert(MediaDecoder.decodeHeader(spliced) === Some(("jpeg", 311, 207)))
    // progressive SOF2 parses too
    val sof2 = sof.clone(); sof2(3) = 0xc2.toByte
    assert(MediaDecoder.decodeHeader(sof2) === Some(("jpeg", 311, 207)))
    // DHT (C4) must NOT be taken for a frame header
    val dht = Array(0xff, 0xc4, 0x00, 0x04, 0, 0).map(_.toByte)
    val withDht = sof.take(2) ++ dht ++ sof.drop(2)
    assert(MediaDecoder.decodeHeader(withDht) === Some(("jpeg", 311, 207)))
  }

  test("header decode: corrupt/truncated/unknown payloads fall back") {
    import Multimodal.{MediaBuild, MediaDecoder}
    assert(MediaDecoder.decodeHeader("plain text payload".getBytes) === None)
    assert(MediaDecoder.decodeHeader(Array.empty[Byte]) === None)
    assert(MediaDecoder.decodeHeader(MediaBuild.png(5, 5).take(20)) === None)
    // PNG signature with a non-IHDR first chunk
    val badPng = MediaBuild.png(5, 5)
    badPng(12) = 'X'.toByte
    assert(MediaDecoder.decodeHeader(badPng) === None)
    // JPEG with no SOF before EOI
    assert(MediaDecoder.decodeHeader(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === None)
    // BMP core-header (size 12 < 40) is not parsed
    val coreBmp = MediaBuild.bmp(9, 9)
    coreBmp(14) = 12.toByte
    assert(MediaDecoder.decodeHeader(coreBmp) === None)
    // decode() routes unknown payloads to the stub
    val stubbed = MediaDecoder.decode(
      Multimodal.MediaRecord(1L, "blob", "hello world".getBytes))
    assert(stubbed.kind === "blob" && stubbed.size_bytes === 11L)
  }

  test("header decode: BMP top-down negative height and GIF87a") {
    import Multimodal.{MediaBuild, MediaDecoder}
    val bmp = MediaBuild.bmp(33, 0) // overwrite height with -44 (top-down)
    val bb = java.nio.ByteBuffer.wrap(bmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -44)
    assert(MediaDecoder.decodeHeader(bmp) === Some(("bmp", 33, 44)))
    val gif87 = MediaBuild.gif(12, 34)
    gif87(4) = '7'.toByte
    assert(MediaDecoder.decodeHeader(gif87) === Some(("gif", 12, 34)))
  }

  test("sampleFrames slices byte ranges deterministically") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((7L, "abcdefghij")).toDF("id", "txt") // 10 bytes
    val frames = Multimodal.sampleFrames(
        Multimodal.asMedia(df, "id", "txt", "video"), everyN = 2, frameSize = 3)
      .orderBy("frame_idx").collect()
    // 10/3 = 3 frames at idx 0,1,2 → sampled every 2nd → idx 0, 2
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(new String(frames(0).getAs[Array[Byte]](2), "UTF-8") === "abc")
    assert(new String(frames(1).getAs[Array[Byte]](2), "UTF-8") === "ghi")
  }

  test("resize decimates payload toward the target area") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((1L, "x" * 100)).toDF("id", "txt")
    val out = Multimodal.resize(
        Multimodal.asMedia(df, "id", "txt", "image"), targetW = 5, targetH = 5)
      .collect().head
    assert(out.payload.length === 25) // 100 bytes / ratio 4
    assert(out.media_id === 1L && out.kind === "image")
  }

  test("extractFeatures: normalized fixed-width embedding, ANN-compatible") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((1L, "aabb"), (2L, "aabb"), (3L, "zzzz")).toDF("id", "txt")
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "id", "txt", "image"), dims = 8)
    assert(feats.schema("embedding").dataType.simpleString === "array<float>")
    val rows = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(rows(1L).sum - 1f) < 1e-6) // histogram normalized
    assert(rows(1L) === rows(2L))              // deterministic
    assert(rows(1L) !== rows(3L))
    // flows into the ANN operator unchanged
    val top = graft.operators.Ann.bruteForceTopK(
      feats, feats.filter(col("media_id") === 1L), "media_id", "embedding", 1)
    assert(top.head().getLong(2) === 2L) // duplicate payload is rank 1
  }

  test("contentReason: unsupported vs corrupt for BMP and WAV classes") {
    import Multimodal.MediaDecoder.contentReason
    import graft.operators.{AudioDedup, ImageDedup}
    val bmp = ImageDedup.ImageBuild.bmp24Gray(4, 4)((x, y) => 10 * x + y)
    def patched(off: Int, v: Int*): Array[Byte] = {
      val c = bmp.clone
      v.zipWithIndex.foreach { case (b, i) => c(off + i) = b.toByte }
      c
    }
    assert(contentReason(bmp) === "ok")
    // well-formed out-of-scope pixel formats route OUT, not dropped
    assert(contentReason(patched(28, 8, 0)) === "unsupported")  // 8-bit
    assert(contentReason(patched(28, 32, 0)) === "unsupported") // 32-bit
    assert(contentReason(patched(30, 1)) === "unsupported")     // RLE
    assert(contentReason(patched(14, 12)) === "unsupported")    // core hdr
    assert(contentReason(patched(18, 0, 0, 32, 0)) === "oversized") // 2^21 w
    assert(contentReason(bmp.take(30)) === "corrupt")           // truncated
    val wav = AudioDedup.WavBuild.pcm16(Array.fill(600)(100))
    assert(contentReason(wav) === "ok")
    val fl = wav.clone; fl(20) = 3 // float tag at 16 bits: o-o-scope width
    assert(contentReason(fl) === "unsupported")
    val b24 = wav.clone; b24(34) = 24 // PCM 24-bit decodes since r11
    assert(contentReason(b24) === "ok")
    val b12 = wav.clone; b12(34) = 12 // PCM at an unhandled width
    assert(contentReason(b12) === "unsupported")
    val adpcm = wav.clone; adpcm(20) = 17 // IMA ADPCM: block codec
    assert(contentReason(adpcm) === "unsupported")
    assert(contentReason(wav.dropRight(1)) === "corrupt") // data cut
    assert(contentReason(wav.take(20)) === "corrupt")     // fmt cut
  }

  test("MediaReason: NULL payload → 'missing' in codegen AND interpreted") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.functions.{ColumnBridge, MediaReason}
    val bmp = graft.operators.ImageDedup.ImageBuild
      .bmp24Gray(2, 2)((x, y) => 40 * (x + y))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, bmp), Row(2L, null), Row(3L, "junk".getBytes("UTF-8"))),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = true))))
    // codegen path (whole-stage projection over the scan)
    val out = df
      .select(col("id"),
        ColumnBridge.col(MediaReason(ColumnBridge.expr(col("payload"))))
          .as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "ok", 2L -> "missing", 3L -> "opaque"))
    // interpreted path: eval on a literal NULL child
    val e = MediaReason(
      org.apache.spark.sql.catalyst.expressions.Literal(null, BinaryType))
    assert(e.eval(null).toString === "missing")
    assert(!e.nullable)
  }

  test("MediaCensusFixtures: every variant decodes to its Expected " +
      "reason (the q109 gate, pinned without Spark)") {
    import graft.queries.MediaCensusFixtures
    val expected = MediaCensusFixtures.Expected.toMap
    assert(MediaCensusFixtures.Expected.map(_._1).distinct.size ===
      MediaCensusFixtures.Expected.size, "duplicate variant name")
    for (id <- Seq(0L, 17L, 999999L)) {
      val vs = MediaCensusFixtures.variants(id)
      assert(vs.map(_._2).toSet === expected.keySet)
      assert(vs.map(_._1).distinct.size === vs.size, "media_id collision")
      vs.foreach { case (_, variant, p) =>
        val reason =
          if (p == null) "missing"
          else Multimodal.MediaDecoder.contentReason(p)
        assert(reason === expected(variant), variant)
      }
    }
  }
}
