package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Content-level video near-duplicate detection — the third member of
  * the [[ImageDedup]]/[[AudioDedup]] family: decode every frame of an
  * animated GIF (pure-JVM GIF89a parser with a REAL LZW decoder — the
  * one mainstream multi-frame container fully decodable with no codec
  * dependency), average the frames pixel-wise into one temporal-mean
  * image, and fingerprint THAT with the 9×8 dHash grid from
  * [[ImageDedup.ImagePixels]]. Blocking is the shared
  * [[HammingBand]] — EXACT pair set for `maxHamming < bands`.
  *
  * Why the temporal-mean image: it gives the same EXACT invariances
  * the q102/q104 fixtures pin —
  *  - frame-repetition time stretch (every frame duplicated k×):
  *    per-pixel sums and counts both scale by k, the integer mean is
  *    unchanged bit-for-bit;
  *  - uniform brightness shift on all frames: the mean shifts by
  *    exactly the same constant, and dHash compares adjacent cells;
  *  - per-frame spatial pixel-replication upscale: the box-average
  *    grid reproduces identical cells.
  * The trade (documented, deliberate): the mean is frame-ORDER
  * insensitive — re-ordered cuts of the same footage collide, which
  * for near-dup BLOCKING is the useful direction (catch more, verify
  * downstream). Per-frame dHashes are exposed via [[frameHashes]] for
  * order-sensitive pipelines (e.g. sampled-frame alignment).
  *
  * Decode scope: GIF87a/89a, global or per-frame local color tables,
  * any frame count; interlaced frames and malformed LZW land in None
  * (the never-throw contract of the family). The temporal mean is
  * defined when all frames share full-canvas geometry (the common
  * full-frame animation case); partial-canvas/offset frames → None
  * rather than a silently wrong composite.
  *
  * Scale shape: identical to the siblings — decode + hash fuse
  * map-side in one expression, only (id, 8-byte sig) rows shuffle.
  */
object VideoDedup {

  object GifPixels {

    /** One decoded frame: full-canvas luma in top-down raster order. */
    final case class Frame(w: Int, h: Int, luma: Array[Int])

    private final val MaxDim = 1 << 14 // 16384 px per side is plenty
    /** Per-frame and per-payload pixel budgets: decoded size must stay
      * payload-proportional, or a ~30-byte crafted header claiming a
      * 16384x16384 frame allocates gigabytes BEFORE any stream
      * validation and escapes the never-throw contract as an
      * uncatchable OutOfMemoryError (the BMP twin bounds decode by
      * payload bytes for the same reason). LZW expands at most 4096x
      * (the longest dictionary entry), so nPixels must also fit under
      * 4096 x the compressed byte count. */
    private final val MaxFramePixels = 1 << 24
    private final val MaxTotalPixels = 1 << 26

    /** Decode all frames of a GIF payload to luma rasters; None for
      * anything structurally invalid, interlaced, oversized, or not
      * full-canvas. Never throws. */
    def decodeFrames(p: Array[Byte]): Option[Vector[Frame]] = {
      try decodeInner(p)
      catch { case _: ArrayIndexOutOfBoundsException |
                   _: NegativeArraySizeException => None }
    }

    private def decodeInner(p: Array[Byte]): Option[Vector[Frame]] = {
      def u8(i: Int): Int = p(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      if (p.length < 13) return None
      val sig = new String(p.slice(0, 6), "US-ASCII")
      if (sig != "GIF89a" && sig != "GIF87a") return None
      val sw = le16(6)
      val sh = le16(8)
      if (sw <= 0 || sw > MaxDim || sh <= 0 || sh > MaxDim) return None
      val packed = u8(10)
      var i = 13
      var gct: Array[Int] = null // luma per palette index
      def readColorTable(n: Int): Option[Array[Int]] = {
        if (i + 3 * n > p.length) return None
        val t = new Array[Int](n)
        var k = 0
        while (k < n) {
          val r = u8(i + 3 * k); val g = u8(i + 3 * k + 1)
          val b = u8(i + 3 * k + 2)
          t(k) = (77 * r + 150 * g + 29 * b) >> 8
          k += 1
        }
        i += 3 * n
        Some(t)
      }
      if ((packed & 0x80) != 0) {
        gct = readColorTable(1 << ((packed & 7) + 1)).getOrElse(return None)
      }
      val frames = Vector.newBuilder[Frame]
      var totalPixels = 0L
      var done = false
      while (!done) {
        if (i >= p.length) return None // missing trailer
        u8(i) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: label + sub-blocks to terminator
            i += 2
            while (i < p.length && u8(i) != 0) i += 1 + u8(i)
            if (i >= p.length) return None
            i += 1
          case 0x2c =>
            if (i + 10 > p.length) return None
            val fx = le16(i + 1); val fy = le16(i + 3)
            val fw = le16(i + 5); val fh = le16(i + 7)
            val fp = u8(i + 9)
            i += 10
            if ((fp & 0x40) != 0) return None // interlace unsupported
            if (fw <= 0 || fw > MaxDim || fh <= 0 || fh > MaxDim)
              return None
            if (fw.toLong * fh > MaxFramePixels) return None
            totalPixels += fw.toLong * fh
            if (totalPixels > MaxTotalPixels) return None
            // temporal mean needs full-canvas frames
            if (fx != 0 || fy != 0 || fw != sw || fh != sh) return None
            val table =
              if ((fp & 0x80) != 0)
                readColorTable(1 << ((fp & 7) + 1)).getOrElse(return None)
              else gct
            if (table == null) return None
            if (i >= p.length) return None
            val minCode = u8(i); i += 1
            if (minCode < 2 || minCode > 11) return None
            // gather LZW sub-blocks
            val data = Array.newBuilder[Byte]
            var blockLen = if (i < p.length) u8(i) else return None
            i += 1
            while (blockLen != 0) {
              if (i + blockLen > p.length) return None
              data ++= p.slice(i, i + blockLen)
              i += blockLen
              blockLen = if (i < p.length) u8(i) else return None
              i += 1
            }
            val lzwBytes = data.result()
            // a valid stream cannot inflate past 4096x: reject before
            // the nPixels allocation, keeping decode payload-bounded
            if (fw.toLong * fh > 4096L * math.max(lzwBytes.length, 1))
              return None
            val idx = lzwDecode(lzwBytes, minCode, fw * fh)
              .getOrElse(return None)
            val luma = new Array[Int](fw * fh)
            var k = 0
            while (k < luma.length) {
              val ci = idx(k)
              if (ci >= table.length) return None
              luma(k) = table(ci)
              k += 1
            }
            frames += Frame(fw, fh, luma)
          case _ => return None
        }
      }
      val out = frames.result()
      if (out.isEmpty) None else Some(out)
    }

    /** Standard GIF LZW decode (variable 3–12-bit codes, LSB-first bit
      * packing, clear/EOI, deferred width bump) of exactly `nPixels`
      * palette indices. None on any malformed stream. */
    private[operators] def lzwDecode(
        data: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Int]] = {
      val clear = 1 << minCode
      val eoi = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Int](4096)
      val stack = new Array[Int](4097)
      val out = new Array[Int](nPixels)
      var outN = 0
      var next = eoi + 1
      var width = minCode + 1
      var prev = -1
      var bitPos = 0
      val nBits = data.length * 8
      def readCode(): Int = {
        if (bitPos + width > nBits) return -1
        var v = 0
        var b = 0
        while (b < width) {
          val bit = bitPos + b
          if ((data(bit >> 3) & (1 << (bit & 7))) != 0) v |= 1 << b
          b += 1
        }
        bitPos += width
        v
      }
      def firstOf(code0: Int): Int = {
        var c = code0
        while (c >= clear) c = prefix(c)
        c
      }
      def emit(code0: Int): Boolean = {
        var c = code0
        var sp = 0
        while (c >= clear) {
          if (sp > 4095) return false // cycle guard
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        if (outN + sp + 1 > nPixels) return false
        out(outN) = c; outN += 1
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        true
      }
      var running = true
      while (running && outN < nPixels) {
        val code = readCode()
        if (code < 0) return None
        if (code == clear) {
          next = eoi + 1; width = minCode + 1; prev = -1
        } else if (code == eoi) {
          running = false
        } else if (prev == -1) {
          if (code >= clear) return None
          if (!emit(code)) return None
          prev = code
        } else {
          if (code > next) return None
          val toEmit =
            if (code == next) {
              if (next >= 4096) return None
              prefix(next) = prev; suffix(next) = firstOf(prev); next += 1
              code
            } else {
              if (next < 4096) {
                prefix(next) = prev; suffix(next) = firstOf(code); next += 1
              }
              code
            }
          if (!emit(toEmit)) return None
          prev = code
          if (next == (1 << width) && width < 12) width += 1
        }
      }
      if (outN == nPixels) Some(out) else None
    }

    /** Per-pixel integer mean of all frames (defined because decode
      * enforces uniform full-canvas geometry). */
    def meanImage(frames: Vector[Frame]): (Int, Int, Array[Int]) = {
      val w = frames.head.w; val h = frames.head.h
      val sum = new Array[Long](w * h)
      frames.foreach { f =>
        var k = 0
        while (k < sum.length) { sum(k) += f.luma(k); k += 1 }
      }
      val mean = new Array[Int](w * h)
      var k = 0
      while (k < mean.length) {
        mean(k) = (sum(k) / frames.length).toInt; k += 1
      }
      (w, h, mean)
    }

    /** 64-bit temporal-mean dHash of a GIF payload. */
    def avgHashOf(payload: Array[Byte]): Option[Long] =
      decodeFrames(payload).map { fs =>
        val (w, h, mean) = meanImage(fs)
        ImageDedup.ImagePixels.dhash64(
          ImageDedup.ImagePixels.grid(mean, w, h, 9, 8))
      }

    /** Per-frame dHashes (order-sensitive surface). */
    def frameHashesOf(payload: Array[Byte]): Option[Seq[Long]] =
      decodeFrames(payload).map(_.map(f =>
        ImageDedup.ImagePixels.dhash64(
          ImageDedup.ImagePixels.grid(f.luma, f.w, f.h, 9, 8))))
  }

  /** Fixture-side builder: real GIF89a bytes with an identity grayscale
    * palette and a spec-honest LZW stream (literal codes with periodic
    * clears — valid for ANY conformant decoder, so fixtures exercise
    * the real decode path end to end). */
  object GifBuild {
    def animatedGray(w: Int, h: Int, frames: Seq[(Int, Int) => Int])
        : Array[Byte] = {
      require(frames.nonEmpty && w >= 1 && h >= 1)
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("GIF89a".getBytes("US-ASCII"))
      le16(w); le16(h)
      out.write(0xf7) // GCT, 256 entries
      out.write(0); out.write(0)
      var c = 0
      while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
      frames.foreach { px =>
        out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
        out.write(8) // LZW min code size → clear=256, eoi=257, width 9
        val codes = Array.newBuilder[Int]
        codes += 256
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            codes += (px(x, y) & 0xff)
            n += 1
            // keep the dictionary under 512 so the width stays 9
            if (n % 200 == 0) codes += 256
            x += 1
          }
          y += 1
        }
        codes += 257
        // pack 9-bit codes LSB-first
        val cs = codes.result()
        val bytes = new Array[Byte]((cs.length * 9 + 7) / 8)
        var bit = 0
        cs.foreach { code =>
          var b = 0
          while (b < 9) {
            if ((code & (1 << b)) != 0)
              bytes((bit + b) >> 3) = (bytes((bit + b) >> 3) |
                (1 << ((bit + b) & 7))).toByte
            b += 1
          }
          bit += 9
        }
        var off = 0
        while (off < bytes.length) {
          val len = math.min(255, bytes.length - off)
          out.write(len)
          out.write(bytes, off, len)
          off += len
        }
        out.write(0) // sub-block terminator
      }
      out.write(0x3b)
      out.toByteArray
    }
  }

  /** 64-bit temporal-mean dHash of a binary GIF payload; NULL when the
    * payload has no video path. */
  def avgHash(payload: Column): Column =
    ColumnBridge.col(graft.functions.VideoAvgHash(
      ColumnBridge.expr(payload)))

  /** All video pairs (id_a < id_b, hamming ≤ maxHamming) — EXACT over
    * decodable payloads when `maxHamming < bands`
    * ([[HammingBand.pairs]]); undecodable payloads are skipped. */
  def nearDupPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    HammingBand.pairs(df, idCol, avgHash(col(payloadCol)),
      maxHamming, bands)
}
