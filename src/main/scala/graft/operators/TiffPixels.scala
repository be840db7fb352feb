package graft.operators

/** Pure-JVM baseline-TIFF decode, luma only — the fourth still-image
  * pixel path next to BMP/PNG/JPEG ([[ImageDedup.ImagePixels]]
  * dispatches here on the `II…42` / `MM…42` magic). TIFF is the
  * scan/dataset
  * interchange format a crawl actually meets; this decoder covers the
  * baseline profile (TIFF 6.0 Part 1):
  *  - both byte orders (II little-endian, MM big-endian);
  *  - the first IFD's image: grayscale (PhotometricInterpretation
  *    0 = WhiteIsZero inverted, 1 = BlackIsZero) at 1/2/4/8/16 bits,
  *    RGB (2) at 8 bits per sample (extra samples — alpha — skipped),
  *    and palette-color (3) through the 16-bit-per-channel ColorMap;
  *  - chunky planar configuration, strip layout (any RowsPerStrip),
  *    Compression 1 (none), 32773 (PackBits byte RLE), 5 (the TIFF
  *    LZW variant — MSB-first codes, EARLY width change), and
  *    8/32946 (Deflate zlib streams);
  *  - both FillOrders (2 = LSB-first: the raw strip bytes are
  *    bit-reversed before decompression, libtiff's convention);
  *  - Predictor 2 (horizontal differencing, TIFF 6.0 §14 — the shape
  *    real encoders emit WITH LZW/Deflate by default) at 8/16 bits:
  *    per-row, per-channel delta accumulation after decompression.
  * Out of scope — "unsupported", the external-codec seam:
  * old/new JPEG (6/7), CCITT fax codes, planar
  * configuration 2, YCbCr/CMYK/LogL photometrics, tiled layout
  * (TileWidth present), Predictor 3 (floating-point differencing),
  * Predictor 2 at sub-byte depths. Broken structure is
  * "corrupt"; dimension/pixel budgets past the policy caps (a
  * pixel count no PackBits stream this size could carry, or total
  * decoded strip bytes past the 64 MB `MaxDecodedBytes` — the r11
  * ADVICE close: LZW/Deflate are exempt from the per-payload-byte
  * pixel bound, so without the byte cap a few-KB payload claiming 8
  * 16-bit samples/px at the pixel cap could force ~268 MB of strip
  * allocations) are "oversized", refused BEFORE anything allocates.
  *
  * Luma mapping is shared with the other paths: gray samples scale
  * to 0..255 by v·255/(2^bits−1); RGB and palette go through the
  * integer BT.601 (77r+150g+29b)>>8 — so a TIFF rendering of the
  * same gray pixels hashes bit-identically to its BMP/PNG twins
  * (the q102 population argument). Never throws
  * (bounds-checked + the family's catch wrapper); fuzz-pinned. */
object TiffPixels {

  private final val MaxPixels = 1 << 24
  /** PackBits expands ≤ 64× (2-byte repeat packet → 128 bytes) and
    * 1-bit rows pack 8 px/byte, so 512 px per payload byte bounds any
    * decodable image; a header claiming more is refused pre-alloc. */
  private final val MaxPixelsPerByte = 512
  /** Cap on TOTAL decoded strip bytes (rowBytes × h), matching the
    * 64 MB luma-plane budget: every in-scope shape at the pixel cap
    * still decodes (gray16+alpha and RGBA8 land exactly ON the
    * boundary — the check is strict; RGB8 is 48 MB) while the
    * pathological spp=8 × 16-bit header (~268 MB) that the
    * unbounded-expansion codecs (LZW/Deflate) could otherwise be
    * made to allocate from a few-KB payload is refused. */
  private final val MaxDecodedBytes = 1L << 26

  /** Bit-reversal table for FillOrder 2 (LSB-first byte packing). */
  private val RevByte: Array[Byte] =
    Array.tabulate(256)(i => (Integer.reverse(i) >>> 24).toByte)

  private def reverseBits(p: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) { out(i) = RevByte(p(off + i) & 0xff); i += 1 }
    out
  }

  def hasMagic(p: Array[Byte]): Boolean =
    p.length >= 8 &&
      ((p(0) == 'I' && p(1) == 'I' && p(2) == 42 && p(3) == 0) ||
       (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 42))

  def decodeGray(p: Array[Byte]): Either[String, (Int, Int, Array[Int])] = {
    try inner(p)
    catch { case _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException => Left("corrupt") }
  }

  private final val Corrupt = Left("corrupt")
  private final val Unsupported = Left("unsupported")
  private final val Oversized = Left("oversized")

  private def inner(p: Array[Byte]): Either[String, (Int, Int, Array[Int])] = {
    if (!hasMagic(p)) return Corrupt
    val le = p(0) == 'I'
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = {
      val v = if (le)
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      else
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      v & 0xffffffffL
    }
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > p.length) return Corrupt
    val nEntries = u16(ifd.toInt)
    val entriesOff = ifd.toInt + 2
    if (entriesOff + nEntries * 12 + 4 > p.length) return Corrupt

    // tag -> values (BYTE/SHORT/LONG widths; everything else skipped)
    def values(tag: Int): Option[Array[Long]] = {
      var e = 0
      while (e < nEntries) {
        val off = entriesOff + e * 12
        if (u16(off) == tag) {
          val tpe = u16(off + 2)
          val count = u32(off + 4)
          val width = tpe match {
            case 1 => 1; case 3 => 2; case 4 => 4
            case _ => return None // RATIONAL etc: not needed here
          }
          if (count <= 0 || count > (1L << 20)) return None
          val total = count * width
          val at =
            if (total <= 4) off + 8
            else {
              val ptr = u32(off + 8)
              if (ptr + total > p.length) return None
              ptr.toInt
            }
          val out = new Array[Long](count.toInt)
          var k = 0
          while (k < out.length) {
            out(k) = width match {
              case 1 => u8(at + k)
              case 2 => u16(at + k * 2)
              case _ => u32(at + k * 4)
            }
            k += 1
          }
          return Some(out)
        }
        e += 1
      }
      None
    }
    def scalar(tag: Int, default: Long): Long =
      values(tag).flatMap(_.headOption).getOrElse(default)

    if (values(322).isDefined || values(323).isDefined)
      return Unsupported // tiled layout
    val w = scalar(256, 0).toInt
    val h = scalar(257, 0).toInt
    if (w < 1 || h < 1) return Corrupt
    if (w.toLong * h > MaxPixels) return Oversized
    val compression = scalar(259, 1).toInt
    if (compression != 1 && compression != 32773 && compression != 5 &&
        compression != 8 && compression != 32946) return Unsupported
    // the per-payload-byte pixel bound holds only for the codecs with
    // bounded expansion (none: 8 px/byte at 1 bit; PackBits: ×64 on
    // top) — LZW/Deflate legitimately expand further and are bounded
    // by MaxPixels alone (≤ 64 MB of luma ints, refused above)
    if ((compression == 1 || compression == 32773) &&
        w.toLong * h > p.length.toLong * MaxPixelsPerByte)
      return Oversized
    if (scalar(284, 1) != 1) return Unsupported // planar config 2
    val fillOrder = scalar(266, 1).toInt
    if (fillOrder != 1 && fillOrder != 2) return Corrupt // 1/2 only per spec
    val predictor = scalar(317, 1).toInt
    if (predictor != 1 && predictor != 2) return Unsupported // 3 = float diff
    val photometric = scalar(262, 1).toInt
    val samplesPerPixel = scalar(277, 1).toInt
    if (samplesPerPixel < 1 || samplesPerPixel > 8) return Corrupt
    val bitsArr = values(258).getOrElse(Array(1L))
    if (bitsArr.isEmpty || bitsArr.exists(_ != bitsArr(0))) return Unsupported
    val bits = bitsArr(0).toInt
    val usable = photometric match {
      // gray (+ extra samples, e.g. alpha — skipped via the sample
      // stride below); sub-byte packing only for single-sample pixels
      case 0 | 1 => (bits == 8 || bits == 16 ||
        (samplesPerPixel == 1 &&
          (bits == 1 || bits == 2 || bits == 4)))
      case 2 => samplesPerPixel >= 3 && bits == 8
      // palette: baseline depths only — the sub-byte extractor reads
      // power-of-two-aligned fields (a 3/5/6/7-bit index would
      // straddle bytes)
      case 3 => samplesPerPixel == 1 &&
        (bits == 1 || bits == 2 || bits == 4 || bits == 8)
      case _ => return Unsupported // YCbCr, CMYK, LogL…
    }
    if (!usable) return Unsupported
    // horizontal differencing at sub-byte depths would accumulate
    // across bit-packed fields — real encoders never emit it
    if (predictor == 2 && bits != 8 && bits != 16) return Unsupported
    val colorMap: Array[Long] =
      if (photometric == 3) values(320).getOrElse(return Corrupt)
      else null
    if (photometric == 3 && colorMap.length < 3 * (1 << bits))
      return Corrupt

    val stripOffsets = values(273).getOrElse(return Corrupt)
    val stripCounts = values(279).getOrElse(return Corrupt)
    if (stripOffsets.isEmpty || stripOffsets.length != stripCounts.length)
      return Corrupt
    val rowsPerStrip = math.min(scalar(278, h.toLong), h.toLong).toInt
    if (rowsPerStrip < 1) return Corrupt
    if ((h + rowsPerStrip - 1) / rowsPerStrip != stripOffsets.length)
      return Corrupt

    val rowBytes = (w.toLong * samplesPerPixel * bits + 7) / 8
    if (rowBytes > Int.MaxValue / math.max(1, rowsPerStrip)) return Oversized
    if (rowBytes * h > MaxDecodedBytes) return Oversized
    val out = new Array[Int](w * h)
    def luma(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8
    val maxV = (1 << bits) - 1
    var strip = 0
    var row0 = 0
    while (strip < stripOffsets.length) {
      val rows = math.min(rowsPerStrip, h - row0)
      val need = (rowBytes * rows).toInt
      val soff = stripOffsets(strip)
      val scount = stripCounts(strip)
      if (soff < 0 || scount < 0 || soff + scount > p.length) return Corrupt
      // FillOrder 2: the STORED bytes (compressed or not) carry the
      // logical bit stream LSB-first — recover MSB-first by reversing
      // each byte before any codec sees it (libtiff reverses the raw
      // strip the same way)
      val (src, srcOff) =
        if (fillOrder == 1) (p, soff.toInt)
        else (reverseBits(p, soff.toInt, scount.toInt), 0)
      val raw: Array[Byte] =
        if (compression == 1) {
          if (scount < need) return Corrupt
          java.util.Arrays.copyOfRange(src, srcOff, srcOff + need)
        } else if (compression == 5) {
          lzwDecode(src, srcOff, scount.toInt, need) match {
            case null => return Corrupt
            case b => b
          }
        } else if (compression == 8 || compression == 32946) {
          // Deflate (official 8 / legacy 32946): one zlib stream/strip
          val inf = new java.util.zip.Inflater()
          inf.setInput(src, srcOff, scount.toInt)
          val outB = new Array[Byte](need)
          try {
            var o = 0
            while (o < need && !inf.finished()) {
              val n = inf.inflate(outB, o, need - o)
              if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
                return Corrupt
              o += n
            }
            if (o < need) return Corrupt
            outB
          } catch {
            case _: java.util.zip.DataFormatException => return Corrupt
          } finally inf.end()
        } else { // PackBits
          val outB = new Array[Byte](need)
          var i = srcOff
          val end = srcOff + scount.toInt
          var o = 0
          while (o < need) {
            if (i >= end) return Corrupt
            val n = src(i); i += 1
            if (n >= 0) { // n+1 literal bytes
              val cnt = n + 1
              if (i + cnt > end || o + cnt > need) return Corrupt
              System.arraycopy(src, i, outB, o, cnt)
              i += cnt; o += cnt
            } else if (n != -128) { // repeat next byte 1-n times
              val cnt = 1 - n
              if (i >= end || o + cnt > need) return Corrupt
              java.util.Arrays.fill(outB, o, o + cnt, src(i))
              i += 1; o += cnt
            } // -128: noop
          }
          outB
        }
      if (predictor == 2)
        undiff(raw, rows, rowBytes.toInt, samplesPerPixel, bits, le)
      var r = 0
      while (r < rows) {
        val rb = (r.toLong * rowBytes).toInt
        var x = 0
        while (x < w) {
          val v: Int = photometric match {
            case 2 => // chunky RGB8 (+ skipped extra samples)
              val o = rb + x * samplesPerPixel
              luma(raw(o) & 0xff, raw(o + 1) & 0xff, raw(o + 2) & 0xff)
            case _ =>
              // first sample of the pixel is the gray/index channel;
              // extra samples (alpha) ride behind it at the spp stride
              val sample =
                if (bits == 16) {
                  val o = rb + x * samplesPerPixel * 2
                  val b0 = raw(o) & 0xff; val b1 = raw(o + 1) & 0xff
                  if (le) b0 | (b1 << 8) else (b0 << 8) | b1
                } else if (bits == 8) raw(rb + x * samplesPerPixel) & 0xff
                else { // sub-byte, MSB-first packing (spp == 1 here)
                  val bitPos = x.toLong * bits
                  val byte = raw(rb + (bitPos >> 3).toInt) & 0xff
                  (byte >> (8 - bits - (bitPos & 7)).toInt) & maxV
                }
              if (photometric == 3) {
                val n = 1 << bits
                luma((colorMap(sample) >> 8).toInt,
                  (colorMap(n + sample) >> 8).toInt,
                  (colorMap(2 * n + sample) >> 8).toInt)
              } else {
                val scaled = sample * 255 / maxV
                if (photometric == 0) 255 - scaled else scaled
              }
          }
          out((row0 + r) * w + x) = v
          x += 1
        }
        r += 1
      }
      row0 += rows
      strip += 1
    }
    Right((w, h, out))
  }

  /** TIFF-variant LZW decode (TIFF 6.0 §13): MSB-first code packing,
    * Clear=256 / EOI=257, dictionary from 258, 9→12-bit codes with
    * the EARLY width change (bump when the next entry to be added
    * would be 2^width−1 — one code earlier than GIF's variant).
    * Returns exactly `need` bytes or null on any structural error
    * (bad code, overrun, missing data). The dictionary is the
    * GIF-decoder chain representation: prefix pointer + first/last
    * byte per entry, output written back-to-front per chain. */
  private def lzwDecode(p: Array[Byte], off: Int, len: Int,
      need: Int): Array[Byte] = {
    if (len <= 0) return null
    val out = new Array[Byte](need)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096) // last byte of the entry
    val first = new Array[Byte](4096) // first byte of the entry
    val length = new Array[Int](4096)
    var i = 0
    while (i < 256) {
      prefix(i) = -1; suffix(i) = i.toByte; first(i) = i.toByte
      length(i) = 1; i += 1
    }
    var pos = off
    val end = off + len
    var acc = 0L
    var cnt = 0
    var width = 9
    var next = 258
    var prev = -1
    var o = 0
    def readCode(): Int = {
      while (cnt < width) {
        if (pos >= end) return -1
        acc = (acc << 8) | (p(pos) & 0xffL)
        pos += 1; cnt += 8
      }
      cnt -= width
      ((acc >>> cnt) & ((1L << width) - 1L)).toInt
    }
    /** Write code's string; optionally append one byte after it. */
    def emit(code: Int, extra: Int): Boolean = {
      val n = length(code) + (if (extra >= 0) 1 else 0)
      if (o + n > need) return false
      if (extra >= 0) out(o + n - 1) = extra.toByte
      var at = o + length(code) - 1
      var c = code
      while (c >= 0) { out(at) = suffix(c); at -= 1; c = prefix(c) }
      o += n
      true
    }
    while (o < need) {
      val code = readCode()
      if (code < 0 || code == 257) return null // truncation / early EOI
      if (code == 256) { // Clear
        width = 9; next = 258; prev = -1
      } else if (prev < 0) {
        if (code > 255) return null // first code after clear: literal
        if (!emit(code, -1)) return null
        prev = code
      } else {
        if (code > next) return null
        if (code == next) { // KwKwK: string(prev) + first(prev)
          if (!emit(prev, first(prev) & 0xff)) return null
        } else if (!emit(code, -1)) return null
        if (next < 4096) {
          prefix(next) = prev
          first(next) = first(prev)
          suffix(next) = if (code == next) first(prev) else first(code)
          length(next) = length(prev) + 1
          next += 1
        }
        if (next == (1 << width) - 1 && width < 12) width += 1 // EARLY
        prev = code
      }
    }
    out
  }

  /** Predictor-2 accumulation (TIFF 6.0 §14), in place: each sample
    * adds its left neighbour of the SAME channel (stride = samples per
    * pixel), per row, modulo the sample width. 16-bit samples add as
    * 16-bit ints in the file's byte order — byte-wise adds would drop
    * the carry between the two halves. */
  private def undiff(raw: Array[Byte], rows: Int, rowBytes: Int,
      spp: Int, bits: Int, le: Boolean): Unit = {
    var r = 0
    while (r < rows) {
      val o = r * rowBytes
      if (bits == 8) {
        var i = spp
        while (i < rowBytes) {
          raw(o + i) = (raw(o + i) + raw(o + i - spp)).toByte
          i += 1
        }
      } else { // 16-bit
        val stride = spp * 2
        var i = stride
        while (i + 1 < rowBytes) {
          def rd(at: Int): Int = {
            val b0 = raw(o + at) & 0xff; val b1 = raw(o + at + 1) & 0xff
            if (le) b0 | (b1 << 8) else (b0 << 8) | b1
          }
          val v = (rd(i) + rd(i - stride)) & 0xffff
          if (le) { raw(o + i) = (v & 0xff).toByte
            raw(o + i + 1) = ((v >> 8) & 0xff).toByte }
          else { raw(o + i) = ((v >> 8) & 0xff).toByte
            raw(o + i + 1) = (v & 0xff).toByte }
          i += 2
        }
      }
      r += 1
    }
  }

  /** Fixture-side builder: real baseline-TIFF bytes (header + pixel
    * strips + a sorted IFD), both byte orders, optional PackBits,
    * any RowsPerStrip — what [[decodeGray]] parses back. */
  object TiffBuild {

    /** Encode with a real PackBits packer (runs ≥ 3 become repeat
      * packets, the rest literal packets ≤ 128). */
    private[operators] def packBits(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < data.length) {
        var run = 1
        while (i + run < data.length && run < 128 &&
          data(i + run) == data(i)) run += 1
        if (run >= 3) {
          out.write(1 - run) // repeat packet
          out.write(data(i))
          i += run
        } else {
          // literal packet: extend until a run of ≥ 3 starts (or 128)
          var lit = i + 1
          var stop = false
          while (!stop && lit < data.length && lit - i < 128) {
            if (lit + 2 < data.length && data(lit) == data(lit + 1) &&
                data(lit) == data(lit + 2)) stop = true
            else lit += 1
          }
          val n = lit - i
          out.write(n - 1)
          out.write(data, i, n)
          i += n
        }
      }
      out.toByteArray
    }

    /** TIFF-variant LZW encoder (greedy longest-match): MSB-first
      * packing, leading Clear, EARLY width change mirroring
      * [[TiffPixels.lzwDecode]], a mid-stream Clear before the
      * dictionary can outgrow 12 bits, trailing EOI. */
    private[operators] def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var cnt = 0
      var width = 9
      def put(code: Int): Unit = {
        acc = (acc << width) | code
        cnt += width
        while (cnt >= 8) {
          cnt -= 8
          out.write(((acc >>> cnt) & 0xff).toInt)
        }
      }
      def flush(): Unit =
        if (cnt > 0) { out.write(((acc << (8 - cnt)) & 0xff).toInt); cnt = 0 }
      var map = new java.util.HashMap[Integer, Integer]()
      var next = 258
      put(256) // spec: streams begin with Clear
      var prev = -1
      var i = 0
      while (i < data.length) {
        val b = data(i) & 0xff
        if (prev < 0) prev = b
        else {
          val key = Integer.valueOf((prev << 8) | b)
          val hit = map.get(key)
          if (hit != null) prev = hit.intValue()
          else {
            put(prev)
            map.put(key, Integer.valueOf(next))
            next += 1
            // the encoder runs ONE entry ahead of the decoder (it adds
            // while emitting; the decoder adds only from the second
            // code on), so it bumps at 2^w where the decoder bumps at
            // 2^w - 1 — the libtiff pairing for the TIFF early change
            if (next == (1 << width) && width < 12) width += 1
            if (next >= 4093) { // table nearly full: restart
              put(256)
              map = new java.util.HashMap[Integer, Integer]()
              width = 9; next = 258
            }
            prev = b
          }
        }
        i += 1
      }
      if (prev >= 0) put(prev)
      put(257) // EOI
      flush()
      out.toByteArray
    }

    private def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }

    /** One image: `photometric` 0/1 gray (`bits` 1/2/4/8/16), 2 RGB8
      * (px returns gray; r=g=b), or 3 palette (`bits` ≤ 8, identity
      * gray map). Pixels spread over ⌈h/rowsPerStrip⌉ strips.
      * `compression`: 1 none, 5 LZW, 8 Deflate, 32773 PackBits.
      * `predictor` 2 = horizontal differencing before compression
      * (8/16-bit only); `fillOrder` 2 = every stored byte
      * bit-reversed after compression. */
    def build(w: Int, h: Int, bits: Int = 8, photometric: Int = 1,
        le: Boolean = true, compression: Int = 1,
        rowsPerStrip: Int = Int.MaxValue, predictor: Int = 1,
        fillOrder: Int = 1)(px: (Int, Int) => Int)
        : Array[Byte] = {
      require(w >= 1 && h >= 1)
      require(Set(1, 5, 8, 32773)(compression), "unknown compression")
      require(predictor == 1 || predictor == 2, "predictor 1/2 only")
      require(predictor == 1 || bits == 8 || bits == 16,
        "predictor 2 needs 8/16-bit samples")
      require(fillOrder == 1 || fillOrder == 2, "fillOrder 1/2 only")
      val spp = if (photometric == 2) 3 else 1
      val rps = math.min(rowsPerStrip, h)
      val rowBytes = ((w.toLong * spp * bits + 7) / 8).toInt
      val maxV = (1 << bits) - 1
      def rawRow(y: Int): Array[Byte] = {
        val row = new Array[Byte](rowBytes)
        var x = 0
        while (x < w) {
          val v = px(x, y)
          photometric match {
            case 2 =>
              row(x * 3) = v.toByte; row(x * 3 + 1) = v.toByte
              row(x * 3 + 2) = v.toByte
            case _ if bits == 16 =>
              // WhiteIsZero inverts here too (review regression: the
              // 8-bit/sub-byte branches inverted, this one did not)
              val v16 = (if (photometric == 0) 255 - v else v) * 65535 / 255
              if (le) { row(x * 2) = (v16 & 0xff).toByte
                row(x * 2 + 1) = ((v16 >> 8) & 0xff).toByte }
              else { row(x * 2) = ((v16 >> 8) & 0xff).toByte
                row(x * 2 + 1) = (v16 & 0xff).toByte }
            case _ if bits == 8 =>
              row(x) = (if (photometric == 0) 255 - v else v).toByte
            case _ =>
              val s0 = if (photometric == 0) maxV - v else v
              require(s0 >= 0 && s0 <= maxV, s"sample $s0 at $bits bits")
              val bitPos = x * bits
              row(bitPos >> 3) = (row(bitPos >> 3) |
                (s0 << (8 - bits - (bitPos & 7)))).toByte
          }
          x += 1
        }
        row
      }
      // forward differencing: the exact inverse of the decoder's
      // undiff — per row, per channel, right-to-left so each
      // subtraction sees the ORIGINAL left neighbour
      def diffRows(raw: Array[Byte], rows: Int): Unit = {
        var r = 0
        while (r < rows) {
          val o = r * rowBytes
          if (bits == 8) {
            var i = rowBytes - 1
            while (i >= spp) {
              raw(o + i) = (raw(o + i) - raw(o + i - spp)).toByte
              i -= 1
            }
          } else { // 16-bit
            val stride = spp * 2
            var i = rowBytes - 2
            while (i >= stride) {
              def rd(at: Int): Int = {
                val b0 = raw(o + at) & 0xff; val b1 = raw(o + at + 1) & 0xff
                if (le) b0 | (b1 << 8) else (b0 << 8) | b1
              }
              val v = (rd(i) - rd(i - stride)) & 0xffff
              if (le) { raw(o + i) = (v & 0xff).toByte
                raw(o + i + 1) = ((v >> 8) & 0xff).toByte }
              else { raw(o + i) = ((v >> 8) & 0xff).toByte
                raw(o + i + 1) = (v & 0xff).toByte }
              i -= 2
            }
          }
          r += 1
        }
      }
      val strips = (0 until h).grouped(rps).map { ys =>
        val raw = ys.toArray.flatMap(rawRow)
        if (predictor == 2) diffRows(raw, ys.length)
        val comp = compression match {
          case 5 => lzwEncode(raw)
          case 8 => deflate(raw)
          case 32773 => packBits(raw)
          case _ => raw
        }
        if (fillOrder == 2) reverseBits(comp, 0, comp.length) else comp
      }.toArray

      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit =
        if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
        else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      def w32(v: Long): Unit =
        if (le) { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
        else { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
      // header
      out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
      w16(42)
      // layout: header(8) | strip data | [colormap] | IFD — each strip
      // padded to even length so every offset lands on the word
      // boundary TIFF 6.0 requires (strict libtiff-lineage readers
      // reject odd IFD/value offsets)
      var at = 8L
      val stripOffs = strips.map { s =>
        val o = at; at += s.length + (s.length & 1); o
      }
      val mapOff = at
      val mapWords = if (photometric == 3) 3 * (1 << bits) else 0
      at += 2L * mapWords
      val ifdOff = at
      w32(ifdOff)
      strips.foreach { s =>
        out.write(s)
        if ((s.length & 1) == 1) out.write(0)
      }
      if (photometric == 3) {
        // identity gray palette: index i -> (i·65535/maxV) each channel
        for (_ <- 0 until 3; i <- 0 to maxV) w16(i * 65535 / maxV)
      }
      // IFD: entries must be tag-sorted
      case class E(tag: Int, tpe: Int, count: Long, inline: Option[Long],
        arr: Array[Long] = null)
      val multiStrip = strips.length > 1
      val entries = scala.collection.mutable.ArrayBuffer[E]()
      entries += E(256, 3, 1, Some(w.toLong))
      entries += E(257, 3, 1, Some(h.toLong))
      entries += E(258, 3, spp.toLong,
        if (spp == 1) Some(bits.toLong) else None,
        if (spp == 1) null else Array.fill(spp)(bits.toLong))
      entries += E(259, 3, 1, Some(compression.toLong))
      entries += E(262, 3, 1, Some(photometric.toLong))
      if (fillOrder != 1) entries += E(266, 3, 1, Some(fillOrder.toLong))
      if (predictor != 1) entries += E(317, 3, 1, Some(predictor.toLong))
      entries += E(273, 4, strips.length.toLong,
        if (multiStrip) None else Some(stripOffs(0)),
        if (multiStrip) stripOffs else null)
      if (spp > 1) entries += E(277, 3, 1, Some(spp.toLong))
      entries += E(278, 3, 1, Some(rps.toLong))
      entries += E(279, 4, strips.length.toLong,
        if (multiStrip) None else Some(strips(0).length.toLong),
        if (multiStrip) strips.map(_.length.toLong) else null)
      if (photometric == 3) entries += E(320, 3, mapWords.toLong, None,
        null) // values live at mapOff, written above
      val sorted = entries.sortBy(_.tag)
      // out-of-line arrays land after the IFD
      var extraOff = ifdOff + 2 + sorted.length * 12 + 4
      val extras = scala.collection.mutable.ArrayBuffer[(Long, Array[Long], Int)]()
      w16(sorted.length)
      sorted.foreach { e =>
        w16(e.tag); w16(e.tpe); w32(e.count)
        e.inline match {
          case Some(v) =>
            // SHORT inline values occupy the first two value bytes
            if (e.tpe == 3) { w16(v.toInt); w16(0) } else w32(v)
          case None =>
            if (e.tag == 320) w32(mapOff)
            else {
              w32(extraOff)
              val width = if (e.tpe == 3) 2 else 4
              extras += ((extraOff, e.arr, width))
              extraOff += e.arr.length * width
            }
        }
      }
      w32(0) // next-IFD pointer
      extras.foreach { case (_, arr, width) =>
        arr.foreach(v => if (width == 2) w16(v.toInt) else w32(v))
      }
      out.toByteArray
    }
  }
}
