package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Content-level audio near-duplicate detection — the audio twin of
  * [[ImageDedup]]: a perceptual 64-bit fingerprint computed from
  * DECODED samples, then the shared [[HammingBand]] blocking. The
  * fingerprint is an energy-envelope difference hash (the dHash idea
  * applied to the loudness contour, cf. Haitsma/Kalker's energy-band
  * sign fingerprints): split the track into 65 equal-duration frames,
  * take per-frame RMS energy, emit the 64 gradient signs
  * `E[i+1] > E[i]`.
  *
  * Invariances (exact by construction, the q102 discipline):
  *  - volume scaling: every frame energy scales by the same factor, so
  *    the gradient signs are untouched;
  *  - duration scaling by sample repetition (the crudest resample),
  *    EXACT when the track's sample count is a multiple of 65: frame
  *    boundaries `⌊i·n/65⌋` are then proportional under k-fold
  *    repetition (`⌊i·k·n/65⌋ = k·⌊i·n/65⌋`), so each frame covers the
  *    same audio content and its RMS is unchanged. For general n the
  *    floor can land a boundary mid-repetition and perturb one frame's
  *    RMS — in practice a ≤1-frame effect that degrades into a small
  *    Hamming distance like any other perturbation (pad/truncate to a
  *    65-multiple before framing if bit-exactness under resample is
  *    required; the q104 fixtures use 520 = 8·65 samples, where the
  *    invariance is exact).
  * Real-world perturbations (noise, codecs, small offsets) degrade
  * into small Hamming distances; the spec pins brute-force parity.
  *
  * Decode scope: WAV/RIFF PCM16 (mono or multi-channel, channels
  * averaged; chunk walk honors odd-size padding), pure JVM —
  * the one mainstream audio container needing no codec dependency.
  * Compressed codecs slot into [[WavPcm.decodeSamples]] via an
  * external library without touching anything downstream.
  *
  * Scale shape: identical to [[ImageDedup]] — decode+hash fuse
  * map-side in one whole-stage-codegen expression, only (id, 8-byte
  * sig) rows shuffle, and for `maxHamming < bands` the pair set is
  * EXACT by pigeonhole.
  */
object AudioDedup {

  /** Frames in the energy envelope; 65 frames → 64 gradient bits. */
  val Frames = 65

  object WavPcm {

    /** Decode a RIFF/WAVE PCM16 payload to channel-averaged samples
      * (`(Σ channels) / n_channels`, integer division — a fixed map
      * both engines and fixtures share). None for anything that is not
      * structurally valid PCM16 WAV — callers treat that as "no audio
      * path", never an exception. */
    def decodeSamples(p: Array[Byte]): Option[Array[Int]] =
      decodeReason(p).toOption

    /** [[decodeSamples]] with the rejection class (r10 ADVICE: a
      * well-formed RIFF/WAVE whose sample format is outside the PCM16
      * scope — IEEE float, a-law/µ-law, ADPCM, extensible, or PCM at
      * 8/24/32 bits — must route out as "unsupported", not be dropped
      * as "corrupt"; "corrupt" is reserved for broken structure:
      * truncated/overrunning chunks, missing fmt/data, zero frames). */
    def decodeReason(p: Array[Byte]): Either[String, Array[Int]] = {
      def u8(i: Int): Int = p(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def s16(i: Int): Int = le16(i).toShort.toInt
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String =
        if (i + 4 > p.length) ""
        else new String(p.slice(i, i + 4), "US-ASCII")
      if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return Left("corrupt")
      var i = 12
      var channels = -1
      var bits = -1
      var format = -1
      var fmtSeen = false
      var data: Option[(Int, Int)] = None // (offset, byteLen)
      while (i + 8 <= p.length && (data.isEmpty || !fmtSeen)) {
        val id = tag(i)
        val sz = le32(i + 4)
        // Long arithmetic: a crafted sz near Int.MaxValue must fail the
        // bounds check, not wrap it (the q104 never-throw contract)
        if (sz < 0 || i.toLong + 8L + sz > p.length) return Left("corrupt")
        if (id == "fmt " && sz >= 16) {
          fmtSeen = true
          format = le16(i + 8)
          channels = le16(i + 10)
          bits = le16(i + 22)
        } else if (id == "data") {
          data = Some((i + 8, sz))
        }
        i += 8 + sz + (sz & 1) // RIFF chunks pad odd sizes
      }
      if (!fmtSeen || data.isEmpty) return Left("corrupt")
      if (channels < 1) return Left("corrupt")
      // 1 = PCM; anything else (3 float, 6/7 a/µ-law, 2/17 ADPCM,
      // 0xFFFE extensible, ...) is a valid format out of scope here
      if (format != 1) return Left("unsupported")
      if (bits != 16) return Left("unsupported")
      val (off, len) = data.get
      val frameBytes = 2 * channels
      val n = len / frameBytes
      if (n == 0) Left("corrupt")
      else {
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          var sum = 0
          var c = 0
          while (c < channels) {
            sum += s16(off + k * frameBytes + 2 * c)
            c += 1
          }
          out(k) = sum / channels
          k += 1
        }
        Right(out)
      }
    }

    /** 65-frame RMS energy envelope → 64 gradient-sign bits,
      * MSB-first. Needs at least [[Frames]] samples (shorter clips
      * have empty frames → no defined envelope → None). */
    def energyHash64(samples: Array[Int]): Option[Long] = {
      val n = samples.length
      if (n < Frames) return None
      val e = new Array[Double](Frames)
      var f = 0
      while (f < Frames) {
        val lo = (f.toLong * n / Frames).toInt
        val hi = ((f + 1).toLong * n / Frames).toInt
        var sum = 0.0
        var k = lo
        while (k < hi) {
          val s = samples(k).toDouble
          sum += s * s
          k += 1
        }
        e(f) = math.sqrt(sum / (hi - lo))
        f += 1
      }
      var bits = 0L
      f = 0
      while (f < Frames - 1) {
        bits <<= 1
        if (e(f + 1) > e(f)) bits |= 1L
        f += 1
      }
      Some(bits)
    }

    def hashOf(payload: Array[Byte]): Option[Long] =
      decodeSamples(payload).flatMap(energyHash64)
  }

  /** Fixture-side builder: real RIFF/WAVE PCM16 bytes (the format
    * [[WavPcm.decodeSamples]] decodes) — q104's plant and the spec
    * corpora go through the REAL byte decode path. */
  object WavBuild {
    def pcm16(samples: Array[Int], channels: Int = 1,
        sampleRate: Int = 16000): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val dataLen = 2 * samples.length
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * 2 * channels).putShort((2 * channels).toShort)
        .putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s => buf.putShort(s.toShort))
      buf.array()
    }
  }

  /** 64-bit energy-envelope hash of a binary audio payload; NULL when
    * the payload has no audio path (not valid PCM16 WAV, or shorter
    * than [[Frames]] samples). */
  def energyHash(payload: Column): Column =
    ColumnBridge.col(graft.functions.AudioEnergyHash(
      ColumnBridge.expr(payload)))

  /** All audio pairs (id_a < id_b, hamming ≤ maxHamming) — EXACT over
    * decodable payloads when `maxHamming < bands`
    * ([[HammingBand.pairs]]); undecodable payloads are skipped. */
  def nearDupPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    HammingBand.pairs(df, idCol, energyHash(col(payloadCol)),
      maxHamming, bands)
}
