package graft

import graft.operators.AudioDedup
import graft.operators.AudioDedup.{WavBuild, WavPcm}

class AudioDedupSpec extends SparkSuite {
  import spark.implicits._

  // per-frame constant magnitude with alternating sign (RMS = magnitude)
  private def clipOf(amps: Array[Int], perFrame: Int = 8,
      stretch: Int = 1, gain: Int = 1): Array[Int] =
    Array.tabulate(amps.length * perFrame * stretch) { i =>
      val a = gain * amps(i / (perFrame * stretch))
      if (i % 2 == 0) a else -a
    }

  private def randAmps(rnd: scala.util.Random): Array[Int] =
    Array.fill(65)(1 + rnd.nextInt(10000))

  // --- decode ---------------------------------------------------------

  test("WAV decode: exact samples, negative values, chunk walk") {
    val samples = Array(0, 1, -1, 32767, -32768, 123, -456, 7)
    val Some(got) = WavPcm.decodeSamples(WavBuild.pcm16(samples))
    assert(got.toSeq === samples.toSeq)
  }

  test("WAV decode: stereo averages channels with integer division") {
    // interleaved L,R pairs → (L+R)/2 (Java integer division)
    val inter = Array(10, 20, -5, 6, 7, -8)
    val Some(got) = WavPcm.decodeSamples(WavBuild.pcm16(inter, channels = 2))
    assert(got.toSeq === Seq(15, 0, 0)) // (7 + -8)/2 = -1/2 = 0 in Java
  }

  test("WAV decode: rejects non-WAV, truncated, out-of-scope formats") {
    val good = WavBuild.pcm16(Array.fill(130)(5))
    assert(WavPcm.decodeSamples("not audio".getBytes).isEmpty)
    assert(WavPcm.decodeSamples(good.take(40)).isEmpty)
    // format 3 at 16 bits: "float" outside the 32/64 scope
    val nonPcm = good.clone; nonPcm(20) = 3
    assert(WavPcm.decodeReason(nonPcm) === Left("unsupported"))
    // 12-bit PCM: recognized format, unhandled width
    val bits12 = good.clone; bits12(34) = 12
    assert(WavPcm.decodeReason(bits12) === Left("unsupported"))
    // IMA ADPCM: well-formed, block codec out of scope
    val adpcm = good.clone; adpcm(20) = 17
    assert(WavPcm.decodeReason(adpcm) === Left("unsupported"))
  }

  // --- r11 widened decode scope ----------------------------------------

  test("cross-format decode parity: PCM16 = float32 = float64 = PCM24 = PCM32") {
    val rnd = new scala.util.Random(0x104a)
    val s = Array.fill(520)(rnd.nextInt(65536) - 32768)
    val ref = WavPcm.decodeSamples(WavBuild.pcm16(s)).get.toSeq
    assert(ref === s.toSeq)
    assert(WavPcm.decodeSamples(
      WavBuild.float32(s.map(_ / 32768.0f))).get.toSeq === ref)
    assert(WavPcm.decodeSamples(
      WavBuild.float64(s.map(_ / 32768.0))).get.toSeq === ref)
    assert(WavPcm.decodeSamples(
      WavBuild.pcm(s.map(_ << 8), bits = 24)).get.toSeq === ref)
    assert(WavPcm.decodeSamples(
      WavBuild.pcm(s.map(_ << 16), bits = 32)).get.toSeq === ref)
  }

  test("PCM8 decode: unsigned bytes map to (u-128)*256; stereo averages") {
    val u = Array(0, 128, 255, 1, 200, 64)
    val Some(mono) = WavPcm.decodeSamples(WavBuild.pcm(u, bits = 8))
    assert(mono.toSeq === u.map(v => (v - 128) << 8).toSeq)
    val Some(st) = WavPcm.decodeSamples(
      WavBuild.pcm(u, bits = 8, channels = 2))
    assert(st.toSeq === Seq((((0 - 128) << 8) + 0) / 2,
      (((255 - 128) << 8) + ((1 - 128) << 8)) / 2,
      (((200 - 128) << 8) + ((64 - 128) << 8)) / 2))
  }

  test("float decode: clamps out-of-range, NaN maps to 0, rint half-even") {
    val f = Array(2.0f, -3.5f, Float.NaN, 0.5f, -0.25f,
      Float.PositiveInfinity, Float.NegativeInfinity, 0f)
    val Some(got) = WavPcm.decodeSamples(WavBuild.float32(f))
    assert(got.toSeq === Seq(32767, -32768, 0, 16384, -8192, 32767,
      -32768, 0))
  }

  test("G.711 decode: published CCITT extreme values, both laws") {
    // µ-law: 0xFF = +0, 0x7F = -0, 0x80 = +32124 (max), 0x00 = -32124
    assert(WavPcm.decodeSamples(WavBuild.g711(
      Array(0xff, 0x7f, 0x80, 0x00).map(_.toByte), alaw = false))
      .get.toSeq === Seq(0, 0, 32124, -32124))
    // a-law: 0xD5 = +8 (smallest +), 0x55 = -8, 0xAA = +32256, 0x2A = -32256
    assert(WavPcm.decodeSamples(WavBuild.g711(
      Array(0xd5, 0x55, 0xaa, 0x2a).map(_.toByte), alaw = true))
      .get.toSeq === Seq(8, -8, 32256, -32256))
  }

  test("G.711 loudness-order collision: a-law and µ-law renderings of " +
      "one (seg,man) sequence hash identically (the q104 quartet)") {
    val rnd = new scala.util.Random(0x104b)
    for (_ <- 1 to 5) {
      val codes = Array.fill(65)(rnd.nextInt(128))
      def spread(f: Int => Byte): Array[Byte] =
        Array.tabulate(520)(i => f(codes(i / 8)))
      val ulaw = WavBuild.g711(spread(c => (~c).toByte), alaw = false)
      val alaw = WavBuild.g711(spread(c => ((0x80 | c) ^ 0x55).toByte),
        alaw = true)
      assert(WavPcm.hashOf(ulaw) === WavPcm.hashOf(alaw))
      assert(WavPcm.hashOf(ulaw).nonEmpty)
    }
  }

  test("IMA ADPCM: known-value expansion, multi-block state reset, " +
      "corrupt classes") {
    // hand-computed from the IMA recurrence: pred=0, idx=0 (step 7);
    // nibble 4 -> diff = 7>>3 + 7 = 7, pred 7, idx 0+2=2 (step 9);
    // nibble 0xC -> diff = 9>>3 + 9 = 10, pred 7-10 = -3, idx 2+2=4
    val one = WavBuild.imaAdpcmMono(Seq((0, 0,
      Array[Byte](0xc4.toByte, 0x00, 0x00, 0x00))))
    val Some(got) = WavPcm.decodeSamples(one)
    assert(got.length === 9) // 1 header sample + 8 nibbles
    assert(got.take(3).toSeq === Seq(0, 7, -3))
    // second block restarts from ITS header state, not the running one
    val two = WavBuild.imaAdpcmMono(Seq(
      (0, 0, Array[Byte](0xc4.toByte, 0, 0, 0)),
      (1000, 88, Array[Byte](0, 0, 0, 0))))
    val Some(g2) = WavPcm.decodeSamples(two)
    assert(g2.length === 18)
    assert(g2(9) === 1000) // block-2 header sample
    // nibble 0 at idx 88: diff = 32767>>3 = 4095 -> 5095, idx 87
    assert(g2(10) === 1000 + (32767 >> 3))
    // corrupt: step index > 88
    val badIdx = one.clone
    // fmt(20B incl. cbSize ext) + pad? fmt sz 20 even; data at 20+8+20+8
    val dataOff = 12 + 8 + 20 + 8
    assert((badIdx(dataOff + 2) & 0xff) === 0) // the index byte
    badIdx(dataOff + 2) = 89.toByte
    assert(WavPcm.decodeReason(badIdx) === Left("corrupt"))
    // corrupt: partial trailing block (data length not a blockAlign
    // multiple) — flag via a hand-truncated data chunk
    val part = WavBuild.imaAdpcmMono(Seq((0, 0, Array[Byte](1, 2, 3, 4))))
    val cut = part.dropRight(2)
    // fix both RIFF and data sizes to the cut length
    val riffSz = cut.length - 8
    cut(4) = (riffSz & 0xff).toByte; cut(5) = ((riffSz >> 8) & 0xff).toByte
    val dataSz = 8 - 2 // 4-byte header + 4 nibbles, minus the cut
    cut(dataOff - 4) = dataSz.toByte; cut(dataOff - 3) = 0
    assert(WavPcm.decodeReason(cut) === Left("corrupt"))
    // unsupported: the ADPCM tag on a 16-bit fmt
    val tagged = WavBuild.pcm16(Array.fill(130)(5))
    tagged(20) = 17
    assert(WavPcm.decodeReason(tagged) === Left("unsupported"))
  }

  test("IMA ADPCM: a track past the sample budget is 'oversized', not " +
      "an allocation failure (review regression)") {
    // 513 blocks of 65528 nibble bytes (blockAlign 65532 — the largest
    // that fits the 16-bit fmt field) -> 513 * 131057 samples > 2^26
    val nibbles = new Array[Byte](65528)
    val big = WavBuild.imaAdpcmMono(Seq.fill(513)((0, 0, nibbles)))
    assert(WavPcm.decodeReason(big) === Left("oversized"))
    // just under the cap still decodes (the cap is a policy line, not
    // a correctness cliff): one such block is ~131k samples
    val small = WavBuild.imaAdpcmMono(Seq((0, 0, nibbles)))
    assert(WavPcm.decodeReason(small).isRight)
  }

  test("IMA ADPCM: fixture-independent expansion parity on random wire " +
      "state (the q104 +10M/+11M pair, operator side)") {
    val rnd = new scala.util.Random(0x11aa)
    for (_ <- 1 to 5) {
      val nibbles = Array.fill(260)(rnd.nextInt(256).toByte)
      val p0 = rnd.nextInt(4001) - 2000
      val i0 = rnd.nextInt(89)
      val wire = WavBuild.imaAdpcmMono(Seq((p0, i0, nibbles)))
      // independent inline recurrence (the q104 oracle-side derivation)
      val want = new Array[Int](521)
      want(0) = p0
      var pred = p0; var idx = i0
      for (k <- 0 until 520) {
        val b = nibbles(k / 2) & 0xff
        val nib = if ((k & 1) == 0) b & 0x0f else b >> 4
        val step = WavPcm.ImaStep(idx)
        var diff = step >> 3
        if ((nib & 1) != 0) diff += step >> 2
        if ((nib & 2) != 0) diff += step >> 1
        if ((nib & 4) != 0) diff += step
        pred = math.max(-32768, math.min(32767,
          if ((nib & 8) != 0) pred - diff else pred + diff))
        idx = math.max(0, math.min(88,
          idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)(nib & 7)))
        want(1 + k) = pred
      }
      assert(WavPcm.decodeSamples(wire).get.toSeq === want.toSeq)
      assert(WavPcm.hashOf(wire) === WavPcm.hashOf(WavBuild.pcm16(want)))
    }
  }

  test("MS-ADPCM: known-value expansion, seeds-first output order, " +
      "corrupt classes") {
    // predictor 0 -> coefs (256, 0): predict = samp1; delta 16.
    // nibbles HIGH-first: byte 0x21 -> nib 2 then nib 1.
    // samp1=100, samp2=-50: out starts [-50, 100] (samp2 FIRST).
    // nib 2: predict 100 + 2*16 = 132; delta = max(16, 230*16/256)=16
    // nib 1: predict 132 + 1*16 = 148
    val one = WavBuild.msAdpcmMono(Seq((0, 16, 100, -50,
      Array[Byte](0x21, 0x00))))
    val Some(got) = WavPcm.decodeSamples(one)
    assert(got.length === 6) // 2 seeds + 4 nibbles
    assert(got.take(4).toSeq === Seq(-50, 100, 132, 148))
    // predictor index past the coef table: corrupt
    val dataOff = 12 + 8 + 50 + 8 // RIFF + fmt hdr + 50-byte fmt + data hdr
    val badPred = one.clone
    assert((badPred(dataOff) & 0xff) === 0)
    badPred(dataOff) = 7
    assert(WavPcm.decodeReason(badPred) === Left("corrupt"))
    // negative nibble: nib 0x9 = -7
    val neg = WavBuild.msAdpcmMono(Seq((0, 16, 0, 0,
      Array[Byte](0x90.toByte, 0x00))))
    // nib 9: predict 0 + (-7)*16 = -112; adapt(9)=614 -> delta 38
    // nib 0: predict -112 + 0 = -112
    assert(WavPcm.decodeSamples(neg).get.toSeq.slice(2, 4) ===
      Seq(-112, -112))
  }

  test("MS-ADPCM: fixture-independent expansion parity on random wire " +
      "state (the q104 +14M/+15M pair, operator side)") {
    val rnd = new scala.util.Random(0x11ab)
    for (_ <- 1 to 5) {
      val nibbles = Array.fill(260)(rnd.nextInt(256).toByte)
      val pred = rnd.nextInt(7)
      val d0 = 16 + rnd.nextInt(400)
      val sa = rnd.nextInt(4001) - 2000
      val sb = rnd.nextInt(4001) - 2000
      val wire = WavBuild.msAdpcmMono(Seq((pred, d0, sa, sb, nibbles)))
      val (c1, c2) = WavBuild.MsCoefs(pred)
      val adapt = WavPcm.MsAdapt
      val want = new Array[Int](2 + 520)
      want(0) = sb; want(1) = sa
      var s1 = sa; var s2 = sb; var delta = d0
      for (k <- 0 until 520) {
        val b = nibbles(k / 2) & 0xff
        val nib = if ((k & 1) == 0) b >> 4 else b & 0x0f
        val signed = (nib << 28) >> 28
        val p0 = (s1.toLong * c1 + s2.toLong * c2) / 256 +
          signed.toLong * delta
        val samp = math.max(-32768L, math.min(32767L, p0)).toInt
        s2 = s1; s1 = samp
        delta = math.max(16, adapt(nib) * delta / 256)
        want(2 + k) = samp
      }
      assert(WavPcm.decodeSamples(wire).get.toSeq === want.toSeq)
      assert(WavPcm.hashOf(wire) === WavPcm.hashOf(WavBuild.pcm16(want)))
    }
  }

  test("cross-container parity: WAV, AIFF, and AU PCM16 of the same " +
      "samples decode and hash identically (the q104 septet)") {
    import AudioDedup.{AiffBuild, AuBuild}
    val rnd = new scala.util.Random(0x104d)
    val s = Array.fill(520)(rnd.nextInt(65536) - 32768)
    val wav = WavBuild.pcm16(s)
    val aiff = AiffBuild.pcm16(s)
    val au = AuBuild.pcm16(s)
    assert(AudioDedup.AiffPcm.decodeSamples(aiff).get.toSeq === s.toSeq)
    assert(AudioDedup.AuPcm.decodeSamples(au).get.toSeq === s.toSeq)
    assert(AudioDedup.hashOfAny(aiff) === AudioDedup.hashOfAny(wav))
    assert(AudioDedup.hashOfAny(au) === AudioDedup.hashOfAny(wav))
    assert(AudioDedup.hashOfAny(wav).nonEmpty)
    // stereo averaging matches the WAV rule in both containers
    val st = Array.fill(520)(rnd.nextInt(65536) - 32768)
    assert(AudioDedup.AiffPcm.decodeSamples(
      AiffBuild.pcm16(st, channels = 2)).get.toSeq ===
      WavPcm.decodeSamples(WavBuild.pcm16(st, channels = 2)).get.toSeq)
    assert(AudioDedup.AuPcm.decodeSamples(
      AuBuild.pcm16(st, channels = 2)).get.toSeq ===
      WavPcm.decodeSamples(WavBuild.pcm16(st, channels = 2)).get.toSeq)
  }

  test("AU decode: every in-scope encoding maps to the WAV-twin values; " +
      "G.72x routes unsupported; to-EOF size") {
    import AudioDedup.AuBuild
    val rnd = new scala.util.Random(0x104e)
    val codes = Array.fill(130)(rnd.nextInt(256).toByte)
    // µ-law and a-law: same bytes as a WAV G.711 payload
    assert(AudioDedup.AuPcm.decodeSamples(AuBuild.build(1, codes)).get.toSeq
      === WavPcm.decodeSamples(WavBuild.g711(codes, alaw = false)).get.toSeq)
    assert(AudioDedup.AuPcm.decodeSamples(AuBuild.build(27, codes)).get.toSeq
      === WavPcm.decodeSamples(WavBuild.g711(codes, alaw = true)).get.toSeq)
    // signed PCM8: s8 << 8 (au is signed, unlike WAV's unsigned PCM8)
    assert(AudioDedup.AuPcm.decodeSamples(
      AuBuild.build(2, Array[Byte](0, 1, -1, 127, -128))).get.toSeq ===
      Seq(0, 256, -256, 127 << 8, -128 << 8))
    // PCM24/32 BE and float 32/64 BE
    val s = Array.fill(40)(rnd.nextInt(65536) - 32768)
    def be(v: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte)
    assert(AudioDedup.AuPcm.decodeSamples(AuBuild.build(4,
      s.flatMap(v => be(v << 8, 3)))).get.toSeq === s.toSeq)
    assert(AudioDedup.AuPcm.decodeSamples(AuBuild.build(5,
      s.flatMap(v => be(v << 16, 4)))).get.toSeq === s.toSeq)
    assert(AudioDedup.AuPcm.decodeSamples(AuBuild.build(6,
      s.flatMap(v => be(java.lang.Float.floatToIntBits(v / 32768.0f), 4))))
      .get.toSeq === s.toSeq)
    assert(AudioDedup.AuPcm.decodeSamples(AuBuild.build(7, s.flatMap { v =>
      val bits = java.lang.Double.doubleToLongBits(v / 32768.0)
      be((bits >>> 32).toInt, 4) ++ be(bits.toInt, 4)
    })).get.toSeq === s.toSeq)
    // G.721 ADPCM: recognized header, out-of-scope codec
    assert(AudioDedup.AuPcm.decodeReason(AuBuild.build(23, codes)) ===
      Left("unsupported"))
    // dataSize 0xFFFFFFFF: unknown, decode to end of file
    val eof = AuBuild.build(3, Array[Byte](0, 10, 0, 20))
    eof(8) = -1; eof(9) = -1; eof(10) = -1; eof(11) = -1
    assert(AudioDedup.AuPcm.decodeSamples(eof).get.toSeq === Seq(10, 20))
  }

  test("AIFF decode: left-justified sub-16/24/32-bit PCM, AIFC sowt/" +
      "float/G.711, unsupported codec, truncation") {
    import AudioDedup.{AiffBuild, AiffPcm}
    // hand-build AIFC around a COMM with a compression type
    def aifc(comp: String, bits: Int, data: Array[Byte]): Array[Byte] = {
      val commLen = 24 // 18 + 4cc + 2-byte empty pstring
      val dataLen = 8 + data.length
      val formLen = 4 + 8 + commLen + 8 + dataLen
      val b = java.nio.ByteBuffer.allocate(8 + formLen)
      b.put("FORM".getBytes("US-ASCII")).putInt(formLen)
        .put("AIFC".getBytes("US-ASCII"))
      b.put("COMM".getBytes("US-ASCII")).putInt(commLen)
      b.putShort(1).putInt(data.length).putShort(bits.toShort)
      b.put(new Array[Byte](10)) // sample rate (unused by the decode)
      b.put(comp.getBytes("US-ASCII")).putShort(0)
      b.put("SSND".getBytes("US-ASCII")).putInt(dataLen)
      b.putInt(0).putInt(0)
      b.put(data)
      b.array()
    }
    val rnd = new scala.util.Random(0x104f)
    val s = Array.fill(40)(rnd.nextInt(65536) - 32768)
    def be(v: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte)
    // plain AIFF at 24/32 bits: left-justified BE shifts back down
    def aiffRaw(bits: Int, data: Array[Byte]): Array[Byte] = {
      val out = aifc("NONE", bits, data)
      out(11) = 'F' // form type AIFF, COMM len stays harmless
      out
    }
    assert(AiffPcm.decodeSamples(
      aiffRaw(24, s.flatMap(v => be(v << 8, 3)))).get.toSeq === s.toSeq)
    assert(AiffPcm.decodeSamples(
      aiffRaw(32, s.flatMap(v => be(v << 16, 4)))).get.toSeq === s.toSeq)
    // 8-bit AIFF is SIGNED: s8 << 8
    assert(AiffPcm.decodeSamples(
      aiffRaw(8, Array[Byte](0, 5, -5, 127, -128))).get.toSeq ===
      Seq(0, 5 << 8, -5 << 8, 127 << 8, -128 << 8))
    // 12-bit: 2-byte container, left-justified — decodes via shift
    assert(AiffPcm.decodeSamples(
      aiffRaw(12, s.flatMap(v => be(v, 2)))).get.toSeq === s.toSeq)
    // AIFC sowt: byte-swapped PCM16
    assert(AiffPcm.decodeSamples(aifc("sowt", 16,
      s.flatMap(v => Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))))
      .get.toSeq === s.toSeq)
    // AIFC fl32 + ulaw share the WAV mappings
    assert(AiffPcm.decodeSamples(aifc("fl32", 32,
      s.flatMap(v => be(java.lang.Float.floatToIntBits(v / 32768.0f), 4))))
      .get.toSeq === s.toSeq)
    val codes = Array.fill(66)(rnd.nextInt(256).toByte)
    assert(AiffPcm.decodeSamples(aifc("ulaw", 8, codes)).get.toSeq ===
      WavPcm.decodeSamples(WavBuild.g711(codes, alaw = false)).get.toSeq)
    // ima4: well-formed AIFC, out-of-scope codec
    assert(AiffPcm.decodeReason(aifc("ima4", 16, new Array[Byte](64))) ===
      Left("unsupported"))
    assert(AiffPcm.decodeReason(AiffBuild.pcm16(s).take(30)) ===
      Left("corrupt"))
  }

  test("WAVE_FORMAT_EXTENSIBLE: PCM16 subtype decodes like plain PCM16; " +
      "foreign GUID is unsupported; short fmt is corrupt") {
    val rnd = new scala.util.Random(0x104c)
    val s = Array.fill(520)(rnd.nextInt(65536) - 32768)
    val ext = WavBuild.extensiblePcm16(s, channels = 2, channelMask = 3)
    val plain = WavBuild.pcm16(s, channels = 2)
    assert(WavPcm.decodeSamples(ext).get.toSeq ===
      WavPcm.decodeSamples(plain).get.toSeq)
    val badGuid = ext.clone; badGuid(50) = 0x11 // GUID tail byte
    assert(WavPcm.decodeReason(badGuid) === Left("unsupported"))
    val short = WavBuild.pcm16(s).clone
    short(20) = 0xfe.toByte; short(21) = 0xff.toByte
    assert(WavPcm.decodeReason(short) === Left("corrupt"))
  }

  test("WAV decode: crafted near-MaxInt chunk size lands in None, never throws") {
    val good = WavBuild.pcm16(Array.fill(130)(5))
    val evil = good.clone
    // declare the data chunk as ~2GB: i+8+sz must not wrap past length
    val v = 0x7ffffff0
    evil(40) = (v & 0xff).toByte; evil(41) = ((v >> 8) & 0xff).toByte
    evil(42) = ((v >> 16) & 0xff).toByte; evil(43) = ((v >> 24) & 0xff).toByte
    assert(WavPcm.decodeSamples(evil).isEmpty)
  }

  test("WAV decode: skips unknown chunks incl. odd-size padding") {
    // hand-splice a 3-byte junk chunk (padded to 4) before data
    val base = WavBuild.pcm16(Array.tabulate(130)(_ % 7))
    val head = base.slice(0, 36) // RIFF..fmt chunk end
    val data = base.slice(36, base.length)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = head ++ junk ++ data
    // fix RIFF size
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xff).toByte; spliced(5) = ((sz >> 8) & 0xff).toByte
    spliced(6) = ((sz >> 16) & 0xff).toByte
    spliced(7) = ((sz >> 24) & 0xff).toByte
    val Some(got) = WavPcm.decodeSamples(spliced)
    assert(got.toSeq === Array.tabulate(130)(_ % 7).toSeq)
  }

  // --- hash invariances ----------------------------------------------

  test("energy hash: invariant to volume gain and sample-repeat stretch") {
    val rnd = new scala.util.Random(104)
    for (_ <- 1 to 5) {
      val amps = randAmps(rnd)
      val h0 = WavPcm.hashOf(WavBuild.pcm16(clipOf(amps))).get
      assert(WavPcm.hashOf(WavBuild.pcm16(clipOf(amps, gain = 2))).get === h0)
      assert(WavPcm.hashOf(WavBuild.pcm16(clipOf(amps, gain = 3))).get === h0)
      assert(WavPcm.hashOf(WavBuild.pcm16(clipOf(amps, stretch = 2))).get === h0)
      assert(WavPcm.hashOf(WavBuild.pcm16(clipOf(amps, stretch = 3))).get === h0)
    }
  }

  test("energy hash: one perturbed frame flips at most 2 bits; too-short clip is None") {
    val rnd = new scala.util.Random(105)
    val amps = randAmps(rnd)
    val h0 = WavPcm.hashOf(WavBuild.pcm16(clipOf(amps))).get
    // pick a rising gradient and flatten it — guarantees >= 1 flip and
    // touches at most the two bits adjacent to the perturbed frame
    val f = (1 until 64).find(i => amps(i) > amps(i - 1)).get
    val pert = amps.clone; pert(f) = amps(f - 1)
    val h1 = WavPcm.hashOf(WavBuild.pcm16(clipOf(pert))).get
    val d = java.lang.Long.bitCount(h0 ^ h1)
    assert(d >= 1 && d <= 2, s"hamming $d")
    assert(WavPcm.hashOf(WavBuild.pcm16(Array.fill(64)(5))).isEmpty)
  }

  // --- nearDupPairs ---------------------------------------------------

  test("nearDupPairs: exact brute-force parity; undecodables skipped") {
    val rnd = new scala.util.Random(106)
    val clips = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    for (i <- 0 until 50) {
      val amps = randAmps(rnd)
      clips += ((i.toLong, WavBuild.pcm16(clipOf(amps))))
      if (i % 3 == 0) { // perturbed copy at small-but-maybe->3 distance
        val pert = amps.clone
        for (_ <- 0 to rnd.nextInt(3))
          pert(rnd.nextInt(65)) = 1 + rnd.nextInt(10000)
        clips += ((1000L + i, WavBuild.pcm16(clipOf(pert))))
      }
      if (i % 5 == 0) clips += ((2000L + i, WavBuild.pcm16(clipOf(amps, gain = 2))))
    }
    clips += ((9999L, "definitely not a wav".getBytes))
    val hashes = clips.flatMap { case (id, p) =>
      WavPcm.hashOf(p).map(id -> _) }.toMap
    val want = (for {
      Seq((a, ha), (b, hb)) <- hashes.toSeq.sortBy(_._1).combinations(2)
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = AudioDedup.nearDupPairs(
        clips.toSeq.toDF("id", "payload").repartition(8), "id", "payload",
        maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(want.exists(_._3 === 0), "gain copies should land at distance 0")
  }
}
