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
  * Decode scope (pure JVM, r11-widened): WAV/RIFF carrying PCM at
  * 8/16/24/32 bits, IEEE float at 32/64 bits, G.711 a-law/µ-law,
  * IMA and MS ADPCM block codecs, or WAVE_FORMAT_EXTENSIBLE
  * resolving to the PCM/float subtypes — mono or multi-channel
  * (channels averaged), chunk walk honoring odd-size padding. Every
  * format normalizes to the signed-16-bit sample domain before
  * hashing, so the same track hashes identically across encodings
  * (the q104 cross-format plant). Remaining codecs (MP3-in-WAV, GSM)
  * slot into [[WavPcm.decodeSamples]] via an external library
  * without touching anything downstream. AIFF/AIFC and Sun .au
  * containers decode through [[AiffPcm]]/[[AuPcm]] behind the same
  * [[hashOfAny]] dispatch.
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

    /** Decode a RIFF/WAVE payload to channel-averaged samples in the
      * SIGNED-16-BIT domain (`(Σ channels) / n_channels`, integer
      * division — a fixed map both engines and fixtures share). Every
      * sample format is normalized to that domain before averaging:
      * PCM8 `(u−128)·256`, PCM16 as-is, PCM24/32 arithmetic-shifted
      * down to 16 significant bits, IEEE float `⌊v·32768⌉` clamped
      * (exact for any 16-bit integer stored as `s/32768`, so a PCM16
      * track and its float rendering hash identically — the q104
      * plant), and G.711 a-law/µ-law through the CCITT expansion
      * formulas. None for anything structurally invalid — callers
      * treat that as "no audio path", never an exception. */
    def decodeSamples(p: Array[Byte]): Option[Array[Int]] =
      decodeReason(p).toOption

    /** [[decodeSamples]] with the rejection class (r10 ADVICE
      * discipline): a well-formed RIFF/WAVE whose sample format is
      * outside the decode scope — MP3-in-WAV, GSM, an extensible
      * GUID that is not the fixed media subtype, or a recognized
      * format at an unhandled width (e.g. 12-bit PCM, 16-bit "float",
      * an ADPCM tag on a 16-bit fmt) — routes out as "unsupported";
      * "corrupt" is reserved for broken structure (truncated/
      * overrunning chunks, missing fmt/data, a short extensible fmt,
      * an ADPCM partial block, out-of-range step/predictor index,
      * zero frames).
      *
      * Decode scope (all pure JVM): PCM at 8/16/24/32 bits (format 1),
      * IEEE float at 32/64 bits (format 3), G.711 a-law (6) and µ-law
      * (7) at 8 bits, IMA ADPCM (format 0x11) and MS-ADPCM (format 2)
      * block decodes at 4 bits, and WAVE_FORMAT_EXTENSIBLE (0xFFFE)
      * resolving to the PCM/float subtypes through its SubFormat
      * GUID.
      *
      * Decoded output is budget-capped at [[MaxSamples]] BEFORE
      * allocation ("oversized" — the video paths' policy-rejection
      * class), and the whole walk is belt-and-braces wrapped like the
      * image/video decodeCores: the bounds arithmetic is checked
      * inline, but an index error can never escape as an exception. */
    def decodeReason(p: Array[Byte]): Either[String, Array[Int]] = {
      try decodeInner(p)
      catch { case _: ArrayIndexOutOfBoundsException |
                   _: NegativeArraySizeException => Left("corrupt") }
    }

    private def decodeInner(p: Array[Byte]): Either[String, Array[Int]] = {
      def u8(i: Int): Int = p(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def s16(i: Int): Int = le16(i).toShort.toInt
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def le64(i: Int): Long = (le32(i) & 0xffffffffL) | (le32(i + 4).toLong << 32)
      def tag(i: Int): String =
        if (i + 4 > p.length) ""
        else new String(p.slice(i, i + 4), "US-ASCII")
      if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return Left("corrupt")
      var i = 12
      var fmtOff = -1
      var fmtSz = 0
      var data: Option[(Int, Int)] = None // (offset, byteLen)
      while (i + 8 <= p.length && (data.isEmpty || fmtOff < 0)) {
        val id = tag(i)
        val sz = le32(i + 4)
        // Long arithmetic: a crafted sz near Int.MaxValue must fail the
        // bounds check, not wrap it (the q104 never-throw contract)
        if (sz < 0 || i.toLong + 8L + sz > p.length) return Left("corrupt")
        if (id == "fmt " && sz >= 16) {
          fmtOff = i + 8
          fmtSz = sz
        } else if (id == "data") {
          data = Some((i + 8, sz))
        }
        i += 8 + sz + (sz & 1) // RIFF chunks pad odd sizes
      }
      if (fmtOff < 0 || data.isEmpty) return Left("corrupt")
      var format = le16(fmtOff)
      val channels = le16(fmtOff + 2)
      val bits = le16(fmtOff + 14)
      if (channels < 1) return Left("corrupt")
      if (format == FormatExtensible) {
        // WAVEFORMATEXTENSIBLE: WAVEFORMATEX(18) + validBits(2) +
        // channelMask(4) + SubFormat GUID(16). The GUID's Data1 low
        // word is the effective format code; everything after it must
        // be the fixed KSDATAFORMAT media-subtype tail or the payload
        // is some other (valid, unknown-here) subtype.
        if (fmtSz < 40) return Left("corrupt")
        var k = 0
        while (k < MediaGuidTail.length) {
          if (p(fmtOff + 26 + k) != MediaGuidTail(k)) return Left("unsupported")
          k += 1
        }
        format = le16(fmtOff + 24)
      }
      if (format == FormatImaAdpcm) {
        // block codec, its own path (r11): 4-bit nibbles, per-block
        // predictor state — not a fixed bytes-per-sample layout
        if (bits != 4) return Left("unsupported")
        val (off, len) = data.get
        return decodeImaAdpcm(p, channels, le16(fmtOff + 12), off, len)
      }
      if (format == FormatMsAdpcm) {
        // the other classic WAV block codec (r11): 2-tap linear
        // predictors from the fmt coefficient table + adaptive delta
        if (bits != 4) return Left("unsupported")
        val (off, len) = data.get
        return decodeMsAdpcm(p, channels, le16(fmtOff + 12), fmtOff,
          fmtSz, off, len)
      }
      // Bytes per stored sample for each in-scope (format, bits) pair;
      // everything else well-formed routes "unsupported"
      val sampleBytes = format match {
        case FormatPcm => bits match {
          case 8 => 1; case 16 => 2; case 24 => 3; case 32 => 4
          case _ => return Left("unsupported")
        }
        case FormatFloat => bits match {
          case 32 => 4; case 64 => 8
          case _ => return Left("unsupported")
        }
        case FormatAlaw | FormatUlaw =>
          if (bits == 8) 1 else return Left("unsupported")
        case _ => return Left("unsupported") // MS-ADPCM, MP3, GSM, ...
      }
      def sample(off: Int): Int = format match {
        case FormatAlaw => alawToLinear(u8(off))
        case FormatUlaw => ulawToLinear(u8(off))
        case FormatFloat =>
          floatTo16(if (bits == 32)
            java.lang.Float.intBitsToFloat(le32(off)).toDouble
          else java.lang.Double.longBitsToDouble(le64(off)))
        case _ => bits match { // PCM
          case 8 => (u8(off) - 128) << 8
          case 16 => s16(off)
          case 24 => ((u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16)) << 8) >> 16
          case _ => le32(off) >> 16
        }
      }
      val (off, len) = data.get
      val frameBytes = sampleBytes * channels
      val n = len / frameBytes
      if (n > MaxSamples) return Left("oversized") // policy cap, see above
      if (n == 0) Left("corrupt")
      else {
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          var sum = 0
          var c = 0
          while (c < channels) {
            sum += sample(off + k * frameBytes + sampleBytes * c)
            c += 1
          }
          out(k) = sum / channels
          k += 1
        }
        Right(out)
      }
    }

    /** Decoded-sample budget (any format): 2^26 samples = 256 MB of
      * int — the audio twin of the video paths' MaxTotalPixels policy
      * cap. A longer VALID track rejects as "oversized" (retryable on
      * a bigger-budget path), never as an allocation failure. */
    private[operators] final val MaxSamples = 1L << 26

    private final val FormatPcm = 1
    private final val FormatMsAdpcm = 2
    private final val FormatFloat = 3
    private final val FormatAlaw = 6
    private final val FormatUlaw = 7
    private final val FormatImaAdpcm = 0x11
    private final val FormatExtensible = 0xfffe

    /** MS-ADPCM adaptation table (public Microsoft constants;
      * exposed for fixture-side independent expansions like
      * [[ImaStep]]). */
    final val MsAdapt: Array[Int] = Array(
      230, 230, 230, 230, 307, 409, 512, 614,
      768, 614, 512, 409, 307, 230, 230, 230)

    /** MS-ADPCM (format 2) block decode: the fmt extension carries
      * wSamplesPerBlock, wNumCoef, and wNumCoef (coef1, coef2) int16
      * predictor pairs; each block opens per channel with a predictor
      * index (validated against wNumCoef), an int16 initial delta, and
      * the two seed samples iSamp1/iSamp2 (which are ALSO the block's
      * first two output samples, in iSamp2-then-iSamp1 order), then
      * 4-bit nibbles HIGH-first, channels alternating per nibble. Per
      * nibble: predict (samp1·coef1 + samp2·coef2)/256 + signed4·delta
      * (clamped int16), shift the taps, adapt
      * delta = max(16, adapt[nibble]·delta/256). */
    private def decodeMsAdpcm(p: Array[Byte], channels: Int,
        blockAlign: Int, fmtOff: Int, fmtSz: Int, off: Int, len: Int)
        : Either[String, Array[Int]] = {
      def u8(i: Int): Int = p(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def s16(i: Int): Int = le16(i).toShort.toInt
      // fmt extension: cbSize(2) + samplesPerBlock(2) + numCoef(2) + pairs
      if (fmtSz < 22) return Left("corrupt")
      val numCoef = le16(fmtOff + 20)
      if (numCoef < 1 || fmtSz < 22 + 4 * numCoef) return Left("corrupt")
      val coef1 = Array.tabulate(numCoef)(k => s16(fmtOff + 22 + 4 * k))
      val coef2 = Array.tabulate(numCoef)(k => s16(fmtOff + 24 + 4 * k))
      val headBytes = 7 * channels
      if (blockAlign <= headBytes) return Left("corrupt")
      val nibblesPerChannel = (blockAlign - headBytes) * 2 / channels
      val samplesPerBlock = 2 + nibblesPerChannel
      val nBlocks = len / blockAlign
      if (nBlocks == 0 || len % blockAlign != 0) return Left("corrupt")
      val totalSamples = nBlocks.toLong * samplesPerBlock
      if (totalSamples > MaxSamples) return Left("oversized")
      val out = new Array[Int](totalSamples.toInt)
      val c1 = new Array[Int](channels); val c2 = new Array[Int](channels)
      val delta = new Array[Int](channels)
      val s1 = new Array[Int](channels); val s2 = new Array[Int](channels)
      var b = 0
      while (b < nBlocks) {
        val boff = off + b * blockAlign
        var c = 0
        var sum2 = 0; var sum1 = 0
        while (c < channels) {
          val pred = u8(boff + c)
          if (pred >= numCoef) return Left("corrupt")
          c1(c) = coef1(pred); c2(c) = coef2(pred)
          delta(c) = s16(boff + channels + 2 * c)
          s1(c) = s16(boff + 3 * channels + 2 * c)
          s2(c) = s16(boff + 5 * channels + 2 * c)
          sum2 += s2(c); sum1 += s1(c)
          c += 1
        }
        val outBase = b * samplesPerBlock
        out(outBase) = sum2 / channels
        out(outBase + 1) = sum1 / channels
        var k = 0
        val nibbleBase = boff + headBytes
        while (k < nibblesPerChannel) {
          var sum = 0
          c = 0
          while (c < channels) {
            val idx = k * channels + c
            val byte = u8(nibbleBase + idx / 2)
            val nib = if ((idx & 1) == 0) byte >> 4 else byte & 0x0f
            val signed = (nib << 28) >> 28 // sign-extend 4 bits
            // Long arithmetic: a crafted coef table at ±32768 with
            // ±32768 seed samples overflows the Int product sum
            val predicted =
              (s1(c).toLong * c1(c) + s2(c).toLong * c2(c)) / 256 +
                signed.toLong * delta(c)
            val samp =
              math.max(-32768L, math.min(32767L, predicted)).toInt
            s2(c) = s1(c); s1(c) = samp
            delta(c) = math.max(16, MsAdapt(nib) * delta(c) / 256)
            sum += samp
            c += 1
          }
          out(outBase + 2 + k) = sum / channels
          k += 1
        }
        b += 1
      }
      Right(out)
    }

    /** IMA/DVI ADPCM step-size and index-adaptation tables (the public
      * IMA reference constants; the step table is exposed for
      * fixture-side independent expansions, like [[JpegPixels]]'
      * zigzag map). */
    final val ImaStep: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
      4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    private[operators] final val ImaIndexAdjust: Array[Int] =
      Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** One IMA ADPCM nibble step: returns the new predictor (the
      * output sample); mutates nothing — callers carry (pred, idx). */
    private[operators] def imaStep(pred: Int, idx: Int, nibble: Int)
        : (Int, Int) = {
      val step = ImaStep(idx)
      var diff = step >> 3
      if ((nibble & 1) != 0) diff += step >> 2
      if ((nibble & 2) != 0) diff += step >> 1
      if ((nibble & 4) != 0) diff += step
      val s = if ((nibble & 8) != 0) pred - diff else pred + diff
      val clamped = math.max(-32768, math.min(32767, s))
      val ni = idx + ImaIndexAdjust(nibble & 7)
      (clamped, math.max(0, math.min(88, ni)))
    }

    /** IMA ADPCM (format 0x11) block decode: each `blockAlign`-sized
      * block opens with a 4-byte header per channel (int16 predictor =
      * output sample 0, uint8 step index, reserved), then 4-byte
      * nibble groups interleaved by channel (8 samples per group per
      * channel, low nibble first). Trailing partial blocks are a
      * structural error ("corrupt" — encoders pad blocks); an index
      * byte past 88 likewise. */
    private def decodeImaAdpcm(p: Array[Byte], channels: Int,
        blockAlign: Int, off: Int, len: Int)
        : Either[String, Array[Int]] = {
      def u8(i: Int): Int = p(i) & 0xff
      def s16(i: Int): Int = (u8(i) | (u8(i + 1) << 8)).toShort.toInt
      val headBytes = 4 * channels
      if (blockAlign <= headBytes ||
          (blockAlign - headBytes) % (4 * channels) != 0)
        return Left("corrupt")
      val groups = (blockAlign - headBytes) / (4 * channels)
      val samplesPerBlock = 1 + groups * 8
      val nBlocks = len / blockAlign
      if (nBlocks == 0 || len % blockAlign != 0) return Left("corrupt")
      // Budget BEFORE allocating (the video paths' policy-cap
      // discipline): the expansion is ≤ 2 samples/input byte, but a
      // giant payload would still decode into a multi-GB int array —
      // and the unchecked Int product could overflow into a
      // NegativeArraySizeException, escaping the never-throw contract.
      val totalSamples = nBlocks.toLong * samplesPerBlock
      if (totalSamples > MaxSamples) return Left("oversized")
      val out = new Array[Int](totalSamples.toInt)
      val pred = new Array[Int](channels)
      val idx = new Array[Int](channels)
      var b = 0
      while (b < nBlocks) {
        val boff = off + b * blockAlign
        var c = 0
        var headSum = 0
        while (c < channels) {
          pred(c) = s16(boff + 4 * c)
          idx(c) = u8(boff + 4 * c + 2)
          if (idx(c) > 88) return Left("corrupt")
          headSum += pred(c)
          c += 1
        }
        val outBase = b * samplesPerBlock
        out(outBase) = headSum / channels
        var g = 0
        while (g < groups) {
          var k = 0
          while (k < 8) { // nibble position within the group
            var sum = 0
            c = 0
            while (c < channels) {
              val byte = u8(boff + headBytes + g * 4 * channels + 4 * c + k / 2)
              val nib = if ((k & 1) == 0) byte & 0x0f else byte >> 4
              val (np, ni) = imaStep(pred(c), idx(c), nib)
              pred(c) = np; idx(c) = ni
              sum += np
              c += 1
            }
            out(outBase + 1 + g * 8 + k) = sum / channels
            k += 1
          }
          g += 1
        }
        b += 1
      }
      Right(out)
    }
    /** KSDATAFORMAT_SUBTYPE GUID minus the leading format-code word:
      * xxxx0000-0000-0010-8000-00AA00389B71 in GUID wire order. */
    private[operators] final val MediaGuidTail: Array[Byte] = Array(
      0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80.toByte, 0x00,
      0x00, 0xaa.toByte, 0x00, 0x38, 0x9b.toByte, 0x71).map(_.toByte)

    /** G.711 a-law expansion (CCITT formula: toggle the even bits,
      * then mantissa<<4 with the per-segment bias and shift; the sign
      * bit SET means positive in a-law wire format). */
    private[operators] def alawToLinear(b: Int): Int = {
      val a = b ^ 0x55
      val man = a & 0x0f
      val seg = (a >> 4) & 0x07
      val t =
        if (seg == 0) (man << 4) + 8
        else ((man << 4) + 0x108) << (seg - 1)
      if ((a & 0x80) != 0) t else -t
    }

    /** G.711 µ-law expansion (CCITT formula: complement, rebuild the
      * biased mantissa, shift by the segment, remove the bias; the
      * sign bit SET in the complemented byte means negative). */
    private[operators] def ulawToLinear(b: Int): Int = {
      val u = ~b & 0xff
      val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
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

  /** AIFF/AIFC decode (r11): the big-endian IFF twin of [[WavPcm]].
    * `FORM…AIFF` carries uncompressed big-endian PCM at 1–32 bits
    * (samples left-justified in ⌈bits/8⌉-byte containers per the
    * spec, arithmetic-shifted to the 16-bit domain); `FORM…AIFC` adds
    * a compression type in COMM — NONE (BE PCM), sowt (the
    * byte-swapped little-endian PCM16 Macs write), fl32/fl64 (IEEE
    * float), and ulaw/alaw (G.711) decode here; anything else routes
    * "unsupported". Same budget cap, channel averaging, and
    * never-throw wrapper as the WAV path. */
  object AiffPcm {

    def hasMagic(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'F' && p(1) == 'O' && p(2) == 'R' &&
        p(3) == 'M' && p(8) == 'A' && p(9) == 'I' && p(10) == 'F' &&
        (p(11) == 'F' || p(11) == 'C')

    def decodeSamples(p: Array[Byte]): Option[Array[Int]] =
      decodeReason(p).toOption

    def decodeReason(p: Array[Byte]): Either[String, Array[Int]] = {
      try decodeInner(p)
      catch { case _: ArrayIndexOutOfBoundsException |
                   _: NegativeArraySizeException => Left("corrupt") }
    }

    private def decodeInner(p: Array[Byte]): Either[String, Array[Int]] = {
      def u8(i: Int): Int = p(i) & 0xff
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def be64(i: Int): Long =
        ((be32(i) & 0xffffffffL) << 32) | (be32(i + 4) & 0xffffffffL)
      def tag(i: Int): String =
        if (i + 4 > p.length) ""
        else new String(p, i, 4, "US-ASCII")
      if (!hasMagic(p)) return Left("corrupt")
      val aifc = p(11) == 'C'
      var i = 12
      var channels = -1
      var bits = -1
      var comp = if (aifc) "" else "NONE"
      var ssnd = Option.empty[(Int, Int)] // (dataOffset, dataLen)
      var commSeen = false
      while (i + 8 <= p.length && (ssnd.isEmpty || !commSeen)) {
        val id = tag(i)
        val sz = be32(i + 4)
        if (sz < 0 || i.toLong + 8L + sz > p.length) return Left("corrupt")
        if (id == "COMM" && sz >= 18) {
          commSeen = true
          channels = be16(i + 8).toShort.toInt
          bits = be16(i + 14).toShort.toInt
          if (aifc) {
            if (sz < 22) return Left("corrupt")
            comp = tag(i + 26) // after the 10-byte extended sample rate
          }
        } else if (id == "SSND" && sz >= 8) {
          val off = be32(i + 8)
          if (off < 0 || off > sz - 8) return Left("corrupt")
          ssnd = Some((i + 16 + off, sz - 8 - off))
        }
        i += 8 + sz + (sz & 1) // IFF chunks pad odd sizes
      }
      if (!commSeen || ssnd.isEmpty) return Left("corrupt")
      if (channels < 1) return Left("corrupt")
      // per-compression container bytes + 16-bit-domain mapping
      val sampleBytes = comp match {
        case "NONE" | "sowt" =>
          if (bits < 1 || bits > 32) return Left("corrupt")
          if (comp == "sowt" && bits != 16) return Left("unsupported")
          (bits + 7) / 8
        case "fl32" | "FL32" => 4
        case "fl64" | "FL64" => 8
        case "ulaw" | "ULAW" | "alaw" | "ALAW" => 1
        case _ => return Left("unsupported") // ima4, GSM, QDM…
      }
      def sample(off: Int): Int = comp match {
        case "sowt" => (u8(off) | (u8(off + 1) << 8)).toShort.toInt
        case "fl32" | "FL32" =>
          floatTo16(java.lang.Float.intBitsToFloat(be32(off)).toDouble)
        case "fl64" | "FL64" =>
          floatTo16(java.lang.Double.longBitsToDouble(be64(off)))
        case "ulaw" | "ULAW" => WavPcm.ulawToLinear(u8(off))
        case "alaw" | "ALAW" => WavPcm.alawToLinear(u8(off))
        case _ => // NONE: big-endian left-justified PCM
          var raw = 0
          var k = 0
          while (k < sampleBytes) { raw = (raw << 8) | u8(off + k); k += 1 }
          val signed = raw << (32 - 8 * sampleBytes) >> (32 - 8 * sampleBytes)
          val shift = 8 * sampleBytes - 16
          if (shift >= 0) signed >> shift else signed << -shift
      }
      val (off, len) = ssnd.get
      val frameBytes = sampleBytes * channels
      val n = len / frameBytes
      if (n > WavPcm.MaxSamples) return Left("oversized")
      if (n == 0) return Left("corrupt")
      val out = new Array[Int](n)
      var k = 0
      while (k < n) {
        var sum = 0
        var c = 0
        while (c < channels) {
          sum += sample(off + k * frameBytes + sampleBytes * c)
          c += 1
        }
        out(k) = sum / channels
        k += 1
      }
      Right(out)
    }
  }

  /** Sun/NeXT .au (".snd") decode (r11): a 24-byte big-endian header
    * (data offset, size, encoding, rate, channels) over raw samples.
    * Encodings 1 (µ-law), 2 (signed PCM8), 3/4/5 (BE PCM16/24/32),
    * 6/7 (BE float32/64), and 27 (a-law) decode; others (G.72x ADPCM,
    * DSP) route "unsupported". dataSize ~0 means "to end of file". */
  object AuPcm {

    def hasMagic(p: Array[Byte]): Boolean =
      p.length >= 24 && p(0) == '.' && p(1) == 's' && p(2) == 'n' &&
        p(3) == 'd'

    def decodeSamples(p: Array[Byte]): Option[Array[Int]] =
      decodeReason(p).toOption

    def decodeReason(p: Array[Byte]): Either[String, Array[Int]] = {
      try decodeInner(p)
      catch { case _: ArrayIndexOutOfBoundsException |
                   _: NegativeArraySizeException => Left("corrupt") }
    }

    private def decodeInner(p: Array[Byte]): Either[String, Array[Int]] = {
      def u8(i: Int): Int = p(i) & 0xff
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def be64(i: Int): Long =
        ((be32(i) & 0xffffffffL) << 32) | (be32(i + 4) & 0xffffffffL)
      if (!hasMagic(p)) return Left("corrupt")
      val dataOff = be32(4)
      val declared = be32(8)
      val encoding = be32(12)
      val channels = be32(20)
      if (dataOff < 24 || dataOff > p.length) return Left("corrupt")
      if (channels < 1 || channels > 64) return Left("corrupt")
      val len =
        if (declared == -1) p.length - dataOff // 0xFFFFFFFF: unknown
        else {
          if (declared < 0 || dataOff.toLong + declared > p.length)
            return Left("corrupt")
          declared
        }
      val sampleBytes = encoding match {
        case 1 | 2 | 27 => 1
        case 3 => 2
        case 4 => 3
        case 5 | 6 => 4
        case 7 => 8
        case _ => return Left("unsupported") // G.72x ADPCM, DSP, …
      }
      def sample(off: Int): Int = encoding match {
        case 1 => WavPcm.ulawToLinear(u8(off))
        case 2 => u8(off).toByte.toInt << 8 // au PCM8 is SIGNED
        case 3 => ((u8(off) << 8) | u8(off + 1)).toShort.toInt
        case 4 => (((u8(off) << 16) | (u8(off + 1) << 8) | u8(off + 2))
          << 8) >> 16
        case 5 => be32(off) >> 16
        case 6 => floatTo16(java.lang.Float.intBitsToFloat(be32(off)).toDouble)
        case 7 => floatTo16(java.lang.Double.longBitsToDouble(be64(off)))
        case _ => WavPcm.alawToLinear(u8(off)) // 27
      }
      val frameBytes = sampleBytes * channels
      val n = len / frameBytes
      if (n > WavPcm.MaxSamples) return Left("oversized")
      if (n == 0) return Left("corrupt")
      val out = new Array[Int](n)
      var k = 0
      while (k < n) {
        var sum = 0
        var c = 0
        while (c < channels) {
          sum += sample(dataOff + k * frameBytes + sampleBytes * c)
          c += 1
        }
        out(k) = sum / channels
        k += 1
      }
      Right(out)
    }
  }

  /** Shared float → signed-16-bit-domain mapping (the WAV float rule:
    * ⌊v·32768⌉ clamped, NaN → 0). */
  private[operators] def floatTo16(v: Double): Int =
    if (v.isNaN) 0
    else math.max(-32768L,
      math.min(32767L, math.rint(v * 32768.0).toLong)).toInt

  /** Container-dispatched decode: WAV, AIFF/AIFC, or AU. */
  def decodeSamplesAny(p: Array[Byte]): Option[Array[Int]] =
    if (AiffPcm.hasMagic(p)) AiffPcm.decodeSamples(p)
    else if (AuPcm.hasMagic(p)) AuPcm.decodeSamples(p)
    else WavPcm.decodeSamples(p)

  /** Container-dispatched energy hash — what the [[energyHash]]
    * column evaluates. */
  def hashOfAny(p: Array[Byte]): Option[Long] =
    decodeSamplesAny(p).flatMap(WavPcm.energyHash64)

  /** Fixture-side builder: real RIFF/WAVE PCM16 bytes (the format
    * [[WavPcm.decodeSamples]] decodes) — q104's plant and the spec
    * corpora go through the REAL byte decode path. */
  object WavBuild {

    /** RIFF/WAVE container around a ready fmt-chunk body and raw data
      * bytes (both chunks padded to even length per RIFF). */
    private def riff(fmtData: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val fmtPad = fmtData.length & 1
      val dataPad = data.length & 1
      val riffLen = 4 + 8 + fmtData.length + fmtPad + 8 + data.length + dataPad
      val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(fmtData.length).put(fmtData)
      if (fmtPad == 1) buf.put(0.toByte)
      buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      if (dataPad == 1) buf.put(0.toByte)
      buf.array()
    }

    /** Plain 16-byte WAVEFORMAT fmt body. */
    private def fmt(format: Int, channels: Int, sampleRate: Int,
        sampleBytes: Int, bits: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(format.toShort).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * sampleBytes * channels)
        .putShort((sampleBytes * channels).toShort).putShort(bits.toShort)
      b.array()
    }

    def pcm16(samples: Array[Int], channels: Int = 1,
        sampleRate: Int = 16000): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val data = java.nio.ByteBuffer.allocate(2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => data.putShort(s.toShort))
      riff(fmt(1, channels, sampleRate, 2, 16), data.array())
    }

    /** PCM at 8 (unsigned bytes, [0,255]), 24, or 32 bits; `samples`
      * carry the RAW stored value for the chosen width. */
    def pcm(samples: Array[Int], bits: Int, channels: Int = 1,
        sampleRate: Int = 16000): Array[Byte] = {
      require(Set(8, 24, 32)(bits) && channels >= 1 &&
        samples.length % channels == 0)
      val sb = bits / 8
      val data = java.nio.ByteBuffer.allocate(sb * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach { s =>
        bits match {
          case 8 => data.put(s.toByte)
          case 24 => data.put(s.toByte).put((s >> 8).toByte).put((s >> 16).toByte)
          case _ => data.putInt(s)
        }
      }
      riff(fmt(1, channels, sampleRate, sb, bits), data.array())
    }

    def float32(samples: Array[Float], channels: Int = 1,
        sampleRate: Int = 16000): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val data = java.nio.ByteBuffer.allocate(4 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(data.putFloat)
      riff(fmt(3, channels, sampleRate, 4, 32), data.array())
    }

    def float64(samples: Array[Double], channels: Int = 1,
        sampleRate: Int = 16000): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val data = java.nio.ByteBuffer.allocate(8 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(data.putDouble)
      riff(fmt(3, channels, sampleRate, 8, 64), data.array())
    }

    /** G.711 payload: raw 8-bit code bytes under format 6 (a-law) or
      * 7 (µ-law). */
    def g711(codes: Array[Byte], alaw: Boolean, channels: Int = 1,
        sampleRate: Int = 8000): Array[Byte] = {
      require(channels >= 1 && codes.length % channels == 0)
      riff(fmt(if (alaw) 6 else 7, channels, sampleRate, 1, 8), codes)
    }

    /** IMA ADPCM (format 0x11) mono payload from raw wire state: one
      * block per (predictor, stepIndex, nibblePairs) triple — the
      * fixture-side twin of [[WavPcm.decodeReason]]'s block decode
      * (gates plant nibble streams and compute the expected expansion
      * independently). Every block must carry the same nibble byte
      * count, a multiple of 4. */
    def imaAdpcmMono(blocks: Seq[(Int, Int, Array[Byte])],
        sampleRate: Int = 16000): Array[Byte] = {
      require(blocks.nonEmpty)
      val nb = blocks.head._3.length
      require(nb > 0 && nb % 4 == 0 &&
        blocks.forall(_._3.length == nb), "uniform 4-multiple blocks")
      val blockAlign = 4 + nb
      require(blockAlign <= 0xffff, "blockAlign is a 16-bit fmt field")
      val samplesPerBlock = 1 + nb * 2
      val fmtB = java.nio.ByteBuffer.allocate(20)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fmtB.putShort(0x11).putShort(1).putInt(sampleRate)
        .putInt(sampleRate * blockAlign / samplesPerBlock) // nominal
        .putShort(blockAlign.toShort).putShort(4)
      fmtB.putShort(2) // cbSize
      fmtB.putShort(samplesPerBlock.toShort)
      val data = java.nio.ByteBuffer.allocate(blocks.size * blockAlign)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      blocks.foreach { case (pred, idx, nibbles) =>
        require(idx >= 0 && idx <= 88, "step index in 0..88")
        data.putShort(pred.toShort).put(idx.toByte).put(0.toByte)
        data.put(nibbles)
      }
      riff(fmtB.array(), data.array())
    }

    /** The seven standard MS-ADPCM predictor pairs (public Microsoft
      * constants, written into every format-2 fmt chunk). */
    val MsCoefs: Array[(Int, Int)] = Array(
      (256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
      (460, -208), (392, -232))

    /** MS-ADPCM (format 2) mono payload from raw wire state: one block
      * per (predictorIdx, delta, samp1, samp2, nibbleBytes) — the
      * format-2 twin of [[imaAdpcmMono]]. Writes the standard
      * seven-pair coefficient table. */
    def msAdpcmMono(blocks: Seq[(Int, Int, Int, Int, Array[Byte])],
        sampleRate: Int = 16000): Array[Byte] = {
      require(blocks.nonEmpty)
      val nb = blocks.head._5.length
      require(nb > 0 && blocks.forall(_._5.length == nb),
        "uniform nibble-byte blocks")
      val blockAlign = 7 + nb
      require(blockAlign <= 0xffff, "blockAlign is a 16-bit fmt field")
      val samplesPerBlock = 2 + nb * 2
      val fmtB = java.nio.ByteBuffer.allocate(22 + 4 * MsCoefs.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fmtB.putShort(2).putShort(1).putInt(sampleRate)
        .putInt(sampleRate * blockAlign / samplesPerBlock) // nominal
        .putShort(blockAlign.toShort).putShort(4)
      fmtB.putShort((4 + 4 * MsCoefs.length).toShort) // cbSize
      fmtB.putShort(samplesPerBlock.toShort)
      fmtB.putShort(MsCoefs.length.toShort)
      MsCoefs.foreach { case (a, b) =>
        fmtB.putShort(a.toShort); fmtB.putShort(b.toShort) }
      val data = java.nio.ByteBuffer.allocate(blocks.size * blockAlign)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      blocks.foreach { case (pred, delta, samp1, samp2, nibbles) =>
        require(pred >= 0 && pred < MsCoefs.length, "predictor in 0..6")
        data.put(pred.toByte).putShort(delta.toShort)
          .putShort(samp1.toShort).putShort(samp2.toShort)
        data.put(nibbles)
      }
      riff(fmtB.array(), data.array())
    }

    /** WAVE_FORMAT_EXTENSIBLE wrapping PCM16 (the common multichannel
      * shape): 40-byte fmt with the media-subtype GUID. */
    def extensiblePcm16(samples: Array[Int], channels: Int = 1,
        channelMask: Int = 0, sampleRate: Int = 16000): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val b = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(0xfffe.toShort).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * 2 * channels).putShort((2 * channels).toShort)
        .putShort(16)
      b.putShort(22) // cbSize
      b.putShort(16) // validBitsPerSample
      b.putInt(channelMask)
      b.putShort(1) // SubFormat code word: PCM
      b.put(WavPcm.MediaGuidTail)
      val data = java.nio.ByteBuffer.allocate(2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => data.putShort(s.toShort))
      riff(b.array(), data.array())
    }
  }

  /** Fixture-side AIFF builder: big-endian PCM16 under FORM/AIFF. */
  object AiffBuild {
    def pcm16(samples: Array[Int], channels: Int = 1,
        sampleRate: Int = 16000): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val dataLen = 8 + 2 * samples.length // SSND offset+blockSize
      val formLen = 4 + 8 + 18 + 8 + dataLen // AIFF + COMM + SSND
      val b = java.nio.ByteBuffer.allocate(8 + formLen) // big-endian
      b.put("FORM".getBytes("US-ASCII")).putInt(formLen)
        .put("AIFF".getBytes("US-ASCII"))
      b.put("COMM".getBytes("US-ASCII")).putInt(18)
      b.putShort(channels.toShort)
      b.putInt(samples.length / channels)
      b.putShort(16)
      // sampleRate as 80-bit IEEE extended: exponent 16382 + log2 int
      // part — for the fixture rates a simple normalized encoding
      val exp = 16383 + (31 - Integer.numberOfLeadingZeros(sampleRate))
      b.putShort(exp.toShort)
      b.putLong(sampleRate.toLong << (63 - (31 - Integer.numberOfLeadingZeros(sampleRate))))
      b.put("SSND".getBytes("US-ASCII")).putInt(dataLen)
      b.putInt(0).putInt(0) // offset, blockSize
      samples.foreach(s => b.putShort(s.toShort))
      b.array()
    }
  }

  /** Fixture-side .au builder: raw encoded bytes under the 24-byte
    * big-endian Sun header (encoding per [[AuPcm]]'s table). */
  object AuBuild {
    def build(encoding: Int, data: Array[Byte], channels: Int = 1,
        sampleRate: Int = 8000): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24 + data.length)
      b.put(".snd".getBytes("US-ASCII"))
      b.putInt(24).putInt(data.length).putInt(encoding)
        .putInt(sampleRate).putInt(channels)
      b.put(data)
      b.array()
    }

    def pcm16(samples: Array[Int], channels: Int = 1,
        sampleRate: Int = 16000): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val data = java.nio.ByteBuffer.allocate(2 * samples.length)
      samples.foreach(s => data.putShort(s.toShort))
      build(3, data.array(), channels, sampleRate)
    }
  }

  /** 64-bit energy-envelope hash of a binary audio payload (WAV,
    * AIFF/AIFC, or AU — [[hashOfAny]]); NULL when the payload has no
    * audio path (no decodable container, or shorter than [[Frames]]
    * samples). */
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
