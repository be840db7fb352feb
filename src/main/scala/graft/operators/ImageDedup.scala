package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Content-level image near-duplicate detection: perceptual fingerprints
  * (dHash / aHash — the difference-hash and average-hash of the public
  * pHash family, Krawetz's "Kind of Like That" construction) computed
  * from DECODED PIXELS, then Hamming-band blocking on the 64-bit
  * fingerprint — the image twin of SimHash text near-dup (q24), sharing
  * its band-bucket + in-bucket [[graft.functions.HammingPairs]]
  * machinery.
  *
  * Decode scope: 24-bit uncompressed BMP (both bottom-up and top-down
  * row orders, 4-byte row padding), parsed by [[ImagePixels]] in pure
  * JVM — the one mainstream raster container decodable with no codec
  * dependency (this sandbox ships none). JPEG/PNG et al. probe their
  * headers in [[Multimodal.MediaDecoder]] but have no pixel path here;
  * a real deployment drops TwelveMonkeys/JavaCV into
  * [[ImagePixels.decodeGray]] without touching anything downstream —
  * the hash, banding, and join shapes are payload-format-agnostic.
  *
  * Invariances (exact, not approximate, by construction):
  *  - uniform scaling: the hash grid is a box-average downscale to a
  *    fixed 9×8 (dHash) / 8×8 (aHash) cell grid, so pixel-replication
  *    scaling reproduces identical cell means;
  *  - uniform brightness shift: dHash bits compare ADJACENT cells
  *    (shift cancels); aHash bits compare cells to the integer grid
  *    mean, which shifts by exactly the same constant.
  * Noisy transforms (re-encode, crops, small rotations) degrade
  * gracefully into small Hamming distances — the spec pins brute-force
  * Hamming parity on perturbed corpora.
  *
  * Scale shape (the q24 contract): only (id, 8-byte signature) rows
  * ever shuffle — pixels are decoded once, map-side, and never move.
  * Banding splits the signature into `bands` slices of 64/bands bits;
  * a pair within Hamming distance h < bands shares at least one
  * untouched slice (pigeonhole), so for `maxHamming < bands` the
  * operator is EXACT over decodable payloads: every pair at distance
  * ≤ maxHamming is emitted, none invented ([[graft.functions
  * .HammingPairs]] verifies the exact distance in-bucket before any
  * pair materializes). With the default 4×16 banding each band key has
  * 2^16 values; buckets hold ~N/65536 images per band, and in-bucket
  * work is pair-quadratic only within a bucket — at larger N, raise
  * `bands` (wider pigeonhole, narrower keys) or pre-split mega-buckets
  * on a second signature slice before the gather, as NearDup documents
  * for text bands.
  */
object ImageDedup {

  /** Pure-JVM pixel decode + fixed-grid perceptual hashing. */
  object ImagePixels {

    /** Decode a 24-bit uncompressed BMP to (width, height, luma rows in
      * TOP-DOWN raster order). Luma = (77r + 150g + 29b) >> 8 (integer
      * BT.601 — exact for grayscale pixels: r=g=b=v gives v). Returns
      * None for anything that is not a structurally valid 24-bit
      * uncompressed BMP — callers treat that as "no pixel path"
      * (quarantine/skip), never an exception. */
    def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      def u8(i: Int): Int = p(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      if (p.length < 54 || u8(0) != 'B' || u8(1) != 'M') return None
      val off = le32(10)
      val hdrSize = le32(14)
      if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
      val w = le32(18)
      val hRaw = le32(22)
      val topDown = hRaw < 0
      // abs(Int.MinValue) is still negative — reject before it can slip
      // through as a "positive" height
      if (hRaw == Int.MinValue) return None
      val h = math.abs(hRaw)
      val planes = le16(26)
      val bpp = le16(28)
      val compression = le32(30)
      // dimension caps keep EVERY later product in Long range (and a
      // crafted 2^30-wide header from wrapping `3*w+3` into a negative
      // stride that defeats the bounds check below) — corrupt headers
      // must land in None, never in an exception (the q102 contract)
      if (w <= 0 || w > (1 << 20) || h == 0 || h > (1 << 20) ||
          planes != 1 || bpp != 24 || compression != 0)
        return None
      val stride = ((3L * w + 3) / 4) * 4
      if (off < 0 || off.toLong < 14L + hdrSize ||
          off.toLong + stride * h > p.length)
        return None
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        var x = 0
        // bounds-checked above: off + stride*h <= p.length <= Int.Max
        val rowOff = off + srcRow * stride.toInt
        while (x < w) {
          val b = u8(rowOff + 3 * x)
          val g = u8(rowOff + 3 * x + 1)
          val r = u8(rowOff + 3 * x + 2)
          out(y * w + x) = (77 * r + 150 * g + 29 * b) >> 8
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }

    /** Box-average downscale to a gw×gh cell grid (top-down row-major).
      * Cell (r, c) averages the pixel block rows [r·h/gh, (r+1)·h/gh) ×
      * cols [c·w/gw, (c+1)·w/gw) with integer division of the exact
      * block sum — pixel-replication upscales of a gw×gh-aligned image
      * reproduce the identical grid. */
    def grid(pix: Array[Int], w: Int, h: Int, gw: Int, gh: Int): Array[Int] = {
      val cells = new Array[Int](gw * gh)
      var r = 0
      while (r < gh) {
        val y0 = r * h / gh
        val y1 = math.max((r + 1) * h / gh, y0 + 1)
        var c = 0
        while (c < gw) {
          val x0 = c * w / gw
          val x1 = math.max((c + 1) * w / gw, x0 + 1)
          var sum = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              sum += pix(y * w + x)
              x += 1
            }
            y += 1
          }
          val area = (math.min(y1, h) - y0).toLong *
            (math.min(x1, w) - x0).toLong
          cells(r * gw + c) = (sum / math.max(area, 1L)).toInt
          c += 1
        }
        r += 1
      }
      cells
    }

    /** dHash: 9×8 grid, bit (r, c) = cell(r, c+1) > cell(r, c) — 64
      * horizontal gradient signs, MSB-first by (r, c). */
    def dhash64(cells9x8: Array[Int]): Long = {
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          bits <<= 1
          if (cells9x8(r * 9 + c + 1) > cells9x8(r * 9 + c)) bits |= 1L
          c += 1
        }
        r += 1
      }
      bits
    }

    /** aHash: 8×8 grid, bit = cell > floor(mean of the 64 cells). */
    def ahash64(cells8x8: Array[Int]): Long = {
      var sum = 0L
      var i = 0
      while (i < 64) { sum += cells8x8(i); i += 1 }
      val mean = sum / 64
      var bits = 0L
      i = 0
      while (i < 64) {
        bits <<= 1
        if (cells8x8(i) > mean) bits |= 1L
        i += 1
      }
      bits
    }

    def dhashOf(payload: Array[Byte]): Option[Long] =
      decodeGray(payload).map { case (w, h, pix) =>
        dhash64(grid(pix, w, h, 9, 8)) }

    def ahashOf(payload: Array[Byte]): Option[Long] =
      decodeGray(payload).map { case (w, h, pix) =>
        ahash64(grid(pix, w, h, 8, 8)) }
  }

  /** Fixture-side builder: real 24-bit uncompressed BMP bytes (the
    * format [[ImagePixels.decodeGray]] decodes) with caller-supplied
    * grayscale pixels — the q102 plant and the spec corpora are built
    * with this, so every hash in a test went through the REAL byte
    * decode path, not a shortcut. */
  object ImageBuild {
    /** `v(x, y)` is the gray value (0–255) at image coordinates with
      * (0,0) the TOP-LEFT pixel; `topDown` selects the stored row
      * order (negative-height BMP) without changing the image. */
    def bmp24Gray(w: Int, h: Int, topDown: Boolean = false)(
        v: (Int, Int) => Int): Array[Byte] = {
      require(w >= 1 && h >= 1)
      val stride = ((3 * w + 3) / 4) * 4
      val size = 54 + stride * h
      val buf = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(size)
        .putShort(0).putShort(0).putInt(54)
      buf.putInt(40).putInt(w).putInt(if (topDown) -h else h)
        .putShort(1).putShort(24)
        .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      var fileRow = 0
      while (fileRow < h) {
        val y = if (topDown) fileRow else h - 1 - fileRow
        var x = 0
        while (x < w) {
          val g = (v(x, y) & 0xff).toByte
          buf.put(g).put(g).put(g)
          x += 1
        }
        var pad = 3 * w
        while (pad < stride) { buf.put(0.toByte); pad += 1 }
        fileRow += 1
      }
      buf.array()
    }
  }

  /** 64-bit perceptual difference-hash of a binary image payload; NULL
    * when the payload has no pixel path (not a valid 24-bit BMP). */
  def dhash(payload: Column): Column =
    ColumnBridge.col(graft.functions.ImageDHash(ColumnBridge.expr(payload)))

  /** 64-bit perceptual average-hash; NULL when undecodable. */
  def ahash(payload: Column): Column =
    ColumnBridge.col(graft.functions.ImageAHash(ColumnBridge.expr(payload)))

  /** All image pairs (id_a < id_b, hamming) whose dHash fingerprints
    * are within `maxHamming` — EXACT over decodable payloads when
    * `maxHamming < bands` ([[HammingBand.pairs]]'s pigeonhole;
    * undecodable payloads have no fingerprint and are skipped). One
    * shuffle of (band, key, id, sig) rows; pixels never move. */
  def nearDupPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    HammingBand.pairs(df, idCol, dhash(col(payloadCol)), maxHamming, bands)
}
