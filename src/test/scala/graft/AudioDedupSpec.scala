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

  test("WAV decode: rejects non-WAV, truncated, non-PCM, 8-bit") {
    val good = WavBuild.pcm16(Array.fill(130)(5))
    assert(WavPcm.decodeSamples("not audio".getBytes).isEmpty)
    assert(WavPcm.decodeSamples(good.take(40)).isEmpty)
    val nonPcm = good.clone; nonPcm(20) = 3 // audioFormat = IEEE float
    assert(WavPcm.decodeSamples(nonPcm).isEmpty)
    val bits8 = good.clone; bits8(34) = 8
    assert(WavPcm.decodeSamples(bits8).isEmpty)
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
