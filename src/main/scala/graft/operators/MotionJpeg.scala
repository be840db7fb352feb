package graft.operators

/** MJPEG-in-AVI video decode — the second real-world container of the
  * video near-dup family ([[VideoDedup]]), next to animated GIF. An
  * AVI file is a RIFF tree: `LIST hdrl` (main header + one `LIST strl`
  * per stream, each with a stream header `strh` and format `strf`)
  * followed by `LIST movi` holding the frame chunks (`##dc`/`##db`,
  * where `##` is the stream number; optionally grouped in `LIST rec `
  * records). For the `vids`/MJPG stream each frame chunk is a complete
  * baseline JPEG — commonly WITHOUT Huffman tables, implying the T.81
  * Annex-K defaults ([[JpegPixels.decodeGray]]'s `mjpegDefaults`
  * mode). Zero-length frame chunks are the standard dropped-frame
  * encoding: the previous frame repeats.
  *
  * Reference scope note: the reference pipeline (a Go log/metric
  * sinker) has no media code at all — this module serves the
  * training-data side of the engine (SURVEY §"multimodal"), where
  * video payloads are fingerprinted map-side and only (id, 8-byte
  * signature) rows ever shuffle.
  *
  * Decode budgets mirror [[VideoDedup.GifPixels]]: frame geometry
  * comes from the stream format header and is validated BEFORE any
  * allocation ([[AviPixels.MaxDim]]/[[AviPixels.MaxFramePixels]]), the
  * running frames × pixels total is capped at
  * [[AviPixels.MaxTotalPixels]] ("oversized", a policy rejection
  * distinct from corruption), and the per-frame JPEG decode carries
  * its own payload-proportional ceilings. Never throws.
  */
object MotionJpeg {

  /** RIFF/AVI magic. */
  def isAvi(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == 'F' && p(8) == 'A' && p(9) == 'V' && p(10) == 'I' &&
      p(11) == ' '

  /** MJPEG fourccs accepted for the stream handler / biCompression
    * (the OpenDML registrations: MJPG and its case twin, plus dmb1 —
    * the QuickTime-lineage MJPEG-A tag some writers emit). */
  private val MjpegFourccs = Set("MJPG", "mjpg", "dmb1")

  object AviPixels {

    private[operators] final val MaxDim = 1 << 14
    private[operators] final val MaxFramePixels = 1 << 24
    private[operators] final val MaxTotalPixels = 1 << 26

    /** Decode all frames to full-frame top-down luma rasters; None
      * for anything structurally invalid, oversized, or carrying a
      * non-MJPEG codec. Never throws. */
    def decodeFrames(p: Array[Byte])
        : Option[Vector[VideoDedup.GifPixels.Frame]] =
      decodeResult(p).toOption

    /** [[decodeFrames]] with the rejection class: Right(frames) or
      * Left("corrupt" | "oversized" | "unsupported"). */
    def decodeResult(p: Array[Byte])
        : Either[String, Vector[VideoDedup.GifPixels.Frame]] = {
      val frames = Vector.newBuilder[VideoDedup.GifPixels.Frame]
      decodeCore(p, (w, h, luma) =>
        frames += VideoDedup.GifPixels.Frame(w, h, luma.clone())) match {
        case Left(r) => Left(r)
        case Right(_) => Right(frames.result())
      }
    }

    /** Quarantine reason for a payload with the AVI magic: "ok",
      * "corrupt" (broken RIFF tree, missing headers, undecodable or
      * geometry-mismatched frame, a drop chunk before any frame),
      * "oversized" (decode-budget policy rejection), or "unsupported"
      * (a well-formed AVI whose video codec is not MJPEG, or whose
      * frames use a JPEG feature outside [[JpegPixels]]' scope —
      * route to the external-codec path, don't drop). */
    def decodeReason(p: Array[Byte]): String =
      decodeCore(p, (_, _, _) => ()) match {
        case Right(_) => "ok"
        case Left(r) => r
      }

    private final val Corrupt = Left("corrupt")
    private final val Oversized = Left("oversized")
    private final val Unsupported = Left("unsupported")

    /** The decode core: parses the RIFF tree and hands each frame's
      * luma to `onFrame` (a buffer the callee must copy to keep — a
      * repeated frame hands back the SAME array). Returns the frame
      * count. Never throws. */
    private[operators] def decodeCore(
        p: Array[Byte],
        onFrame: (Int, Int, Array[Int]) => Unit): Either[String, Int] = {
      try decodeInner(p, onFrame)
      catch { case _: ArrayIndexOutOfBoundsException |
                   _: NegativeArraySizeException => Corrupt }
    }

    private def decodeInner(
        p: Array[Byte],
        onFrame: (Int, Int, Array[Int]) => Unit): Either[String, Int] = {
      def u8(i: Int): Int = p(i) & 0xff
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String =
        if (i + 4 > p.length) ""
        else new String(p, i, 4, "US-ASCII")
      if (!isAvi(p)) return Corrupt

      // ---- pass 1: hdrl — find the vids stream, its codec, geometry
      var videoStream = -1
      var handlerOk = false
      var w = 0; var h = 0
      var streamIdx = 0
      def parseStrl(off: Int, end: Int): Either[String, Unit] = {
        var j = off
        var fccType = ""
        var isVids = false
        while (j + 8 <= end) {
          val id = tag(j)
          val sz = le32(j + 4)
          if (sz < 0 || j.toLong + 8L + sz > end) return Corrupt
          if (id == "strh" && sz >= 8) {
            fccType = tag(j + 8)
            if (fccType == "vids" && videoStream < 0) {
              isVids = true
              videoStream = streamIdx
              if (MjpegFourccs(tag(j + 12))) handlerOk = true
            }
          } else if (id == "strf" && isVids && sz >= 20) {
            // BITMAPINFOHEADER: biWidth at +4, biHeight at +8 (may be
            // negative = top-down; magnitude is the geometry),
            // biCompression fourcc at +16
            w = le32(j + 12)
            h = math.abs(le32(j + 16))
            if (MjpegFourccs(tag(j + 24))) handlerOk = true
          }
          j += 8 + sz + (sz & 1)
        }
        streamIdx += 1
        Right(())
      }
      def parseHdrl(off: Int, end: Int): Either[String, Unit] = {
        var j = off
        while (j + 8 <= end) {
          val id = tag(j)
          val sz = le32(j + 4)
          if (sz < 0 || j.toLong + 8L + sz > end) return Corrupt
          if (id == "LIST" && sz >= 4 && tag(j + 8) == "strl")
            parseStrl(j + 12, j + 8 + sz) match {
              case Left(r) => return Left(r)
              case _ => ()
            }
          j += 8 + sz + (sz & 1)
        }
        Right(())
      }

      // ---- top-level walk: hdrl first, then movi
      val riffEnd = {
        val declared = le32(4)
        if (declared < 4) return Corrupt
        math.min(p.length.toLong, 8L + declared).toInt
      }
      var i = 12
      var moviOff = -1; var moviEnd = -1
      while (i + 8 <= riffEnd && moviOff < 0) {
        val id = tag(i)
        val sz = le32(i + 4)
        if (sz < 0 || i.toLong + 8L + sz > riffEnd) return Corrupt
        if (id == "LIST" && sz >= 4) {
          tag(i + 8) match {
            case "hdrl" => parseHdrl(i + 12, i + 8 + sz) match {
              case Left(r) => return Left(r)
              case _ => ()
            }
            case "movi" => moviOff = i + 12; moviEnd = i + 8 + sz
            case _ => ()
          }
        }
        i += 8 + sz + (sz & 1)
      }
      if (videoStream < 0 || moviOff < 0) return Corrupt
      if (!handlerOk) return Unsupported
      if (w < 1 || h < 1 || w > MaxDim || h > MaxDim) return Corrupt
      if (w.toLong * h > MaxFramePixels) return Oversized

      // ---- pass 2: movi — decode the vids frames in order
      val dcId = f"$videoStream%02ddc"
      val dbId = f"$videoStream%02ddb"
      var last: Array[Int] = null
      var frames = 0
      var totalPixels = 0L
      def frameChunk(off: Int, sz: Int): Either[String, Unit] = {
        totalPixels += w.toLong * h
        if (totalPixels > MaxTotalPixels) return Oversized
        if (sz == 0) {
          // standard dropped-frame encoding: previous frame repeats
          if (last == null) return Corrupt
        } else {
          val bytes = java.util.Arrays.copyOfRange(p, off, off + sz)
          JpegPixels.decodeGray(bytes, mjpegDefaults = true) match {
            case Right((fw, fh, luma)) =>
              if (fw != w || fh != h) return Corrupt
              last = luma
            case Left(r) => return Left(r)
          }
        }
        frames += 1
        onFrame(w, h, last)
        Right(())
      }
      // depth-bounded: the spec nests 'rec ' groups ONE level inside
      // movi; a crafted payload with thousands of nested rec headers
      // must land in "corrupt", not drive the recursion into a
      // StackOverflowError (an Error escapes decodeCore's never-throw
      // catch and would kill the Spark task)
      def walkMovi(off: Int, end: Int, depth: Int): Either[String, Unit] = {
        if (depth > 4) return Corrupt
        var j = off
        while (j + 8 <= end) {
          val id = tag(j)
          val sz = le32(j + 4)
          if (sz < 0 || j.toLong + 8L + sz > end) return Corrupt
          if (id == "LIST" && sz >= 4 && tag(j + 8) == "rec ")
            walkMovi(j + 12, j + 8 + sz, depth + 1) match {
              case Left(r) => return Left(r)
              case _ => ()
            }
          else if (id == dcId || id == dbId)
            frameChunk(j + 8, sz) match {
              case Left(r) => return Left(r)
              case _ => ()
            }
          j += 8 + sz + (sz & 1)
        }
        Right(())
      }
      walkMovi(moviOff, moviEnd, 0) match {
        case Left(r) => return Left(r)
        case _ => ()
      }
      if (frames == 0) Corrupt else Right(frames)
    }
  }

  /** Fixture-side builder: a real single-video-stream MJPEG AVI
    * around ready JPEG frame payloads (typically
    * [[JpegBuild.gray]] — with `writeDht = false` for the DHT-less
    * MJPEG wire shape). An empty frame array writes a zero-length
    * chunk (the dropped-frame/repeat encoding). */
  object AviBuild {

    def mjpeg(w: Int, h: Int, frames: Seq[Array[Byte]], fps: Int = 10,
        handler: String = "MJPG", recWrap: Boolean = false): Array[Byte] = {
      require(w >= 1 && h >= 1 && frames.nonEmpty && fps >= 1)
      require(handler.length == 4, "handler must be a fourcc")
      val out = new java.io.ByteArrayOutputStream()
      // ByteArrayOutputStream has no random access; chunk sizes get
      // patched on the final array
      val patches = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def chunk(id: String)(body: => Unit): Unit = {
        fourcc(id)
        val lenAt = out.size()
        le32(0)
        body
        val end = out.size()
        patches += ((lenAt, end - lenAt - 4))
        if (((end - lenAt - 4) & 1) == 1) out.write(0)
      }
      def list(listType: String)(body: => Unit): Unit =
        chunk("LIST") { fourcc(listType); body }

      val maxFrame = frames.map(_.length).max
      chunk("RIFF") {
        fourcc("AVI ")
        list("hdrl") {
          chunk("avih") {
            le32(1000000 / fps); le32(0); le32(0); le32(0)
            le32(frames.size); le32(0); le32(1); le32(maxFrame)
            le32(w); le32(h)
            le32(0); le32(0); le32(0); le32(0) // reserved
          }
          list("strl") {
            chunk("strh") {
              fourcc("vids"); fourcc(handler)
              le32(0); le16(0); le16(0); le32(0)
              le32(1); le32(fps) // scale, rate
              le32(0); le32(frames.size); le32(maxFrame)
              le32(-1); le32(0) // quality, sampleSize
              le16(0); le16(0); le16(w); le16(h) // rcFrame
            }
            chunk("strf") { // BITMAPINFOHEADER
              le32(40); le32(w); le32(h); le16(1); le16(24)
              fourcc(handler); le32(w * h * 3)
              le32(0); le32(0); le32(0); le32(0)
            }
          }
        }
        list("movi") {
          def writeFrames(): Unit =
            frames.foreach(f => chunk("00dc")(out.write(f, 0, f.length)))
          if (recWrap) list("rec ")(writeFrames()) else writeFrames()
        }
      }
      val bytes = out.toByteArray
      patches.foreach { case (at, v) =>
        bytes(at) = (v & 0xff).toByte
        bytes(at + 1) = ((v >> 8) & 0xff).toByte
        bytes(at + 2) = ((v >> 16) & 0xff).toByte
        bytes(at + 3) = ((v >> 24) & 0xff).toByte
      }
      bytes
    }
  }
}
