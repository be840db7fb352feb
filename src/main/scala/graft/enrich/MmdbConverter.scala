package graft.enrich

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** Offline converter for MaxMind DB (GeoIP2 / GeoLite2-City) `.mmdb`
  * files — the E6 vendor geo database (selected via `NALI_DB_IP4` /
  * `NALI_DB_IP6`, ipHandle/db/db.go:29-93; lookup + rendering semantics
  * ipHandle/pkg/geoip/geoip.go:39-74). Implements the publicly specified
  * MaxMind DB binary format (binary search tree over address bits +
  * typed data section + metadata map): the whole tree is enumerated once
  * at build time into the sorted [[IpRange]] table that the broadcast
  * binsearch lookup ([[IpRangeLookup]]) consumes — the per-row probe
  * stays O(log n) regardless of the source DB format.
  *
  * Reference rendering parity (geoip.go:50-73): per record the language
  * is the caller's `lang` if the country-names map has it, else
  * `zh-CN`; the rendered text is `"<country> <city>"` (country alone
  * when the city name is missing), which [[IpRangeLookup.splitLocIsp]]
  * then tokenizes exactly as it does qqwry text. The country name goes
  * to `IpRange.country` and the city to `IpRange.area`, so the combined
  * string matches the reference's `Result.String()`.
  */
object MmdbConverter {

  private val Marker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++ "MaxMind.com".getBytes(UTF_8)

  /** A file is mmdb iff the metadata marker appears near the end (the
    * spec bounds the metadata section to the last 128 KiB). */
  def isMmdb(data: Array[Byte]): Boolean = markerIndex(data) >= 0

  private def markerIndex(data: Array[Byte]): Int = {
    val lo = math.max(0, data.length - (128 * 1024 + Marker.length))
    var i = data.length - Marker.length
    while (i >= lo) {
      var j = 0
      while (j < Marker.length && data(i + j) == Marker(j)) j += 1
      if (j == Marker.length) return i
      i -= 1
    }
    -1
  }

  // ---- data-section decoder (spec: maxmind.github.io/MaxMind-DB) ----

  /** Decoder over `data` where field offsets are relative to `base`.
    * Returns (value, next-relative-offset). Maps/arrays become Scala
    * Map[String, Any] / Vector[Any]; all uints widen to Long (uint128 to
    * BigInt); strings are UTF-8. */
  private final class Decoder(data: Array[Byte], base: Int) {
    private def u8(rel: Int): Int = data(base + rel) & 0xff
    private def beUint(rel: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(rel + i); i += 1 }
      v
    }

    def decode(off: Int): (Any, Int) = {
      val ctrl = u8(off)
      var typ = ctrl >>> 5
      var p = off + 1
      if (typ == 1) { // pointer — size bits encode width, not length
        val ss = (ctrl >>> 3) & 0x3
        val vvv = ctrl & 0x7
        val (target, after) = ss match {
          // spec: bias is added AFTER the or — ((vvv<<16)|payload)+2048.
          // The +bias binds tighter than | in Scala, so parens matter: an
          // unparenthesized payload+2048 overflowing into bit 16 cannot
          // carry through the or and lands 65536 short.
          case 0 => ((vvv << 8) | u8(p), p + 1)
          case 1 => (((vvv << 16) | beUint(p, 2).toInt) + 2048, p + 2)
          case 2 => (((vvv << 24) | beUint(p, 3).toInt) + 526336, p + 3)
          case _ => (beUint(p, 4).toInt, p + 4)
        }
        return (decode(target)._1, after)
      }
      if (typ == 0) { typ = 7 + u8(p); p += 1 } // extended type
      var size = ctrl & 0x1f
      if (size == 29) { size = 29 + u8(p); p += 1 }
      else if (size == 30) { size = 285 + beUint(p, 2).toInt; p += 2 }
      else if (size == 31) { size = 65821 + beUint(p, 3).toInt; p += 3 }
      typ match {
        case 2 => (new String(data, base + p, size, UTF_8), p + size)
        case 3 => (java.lang.Double.longBitsToDouble(beUint(p, 8)), p + 8)
        case 4 => (java.util.Arrays.copyOfRange(data, base + p, base + p + size), p + size)
        case 5 | 6 | 9 => (beUint(p, size), p + size)
        case 8 => // int32: sign-extend from `size` big-endian bytes
          val raw = beUint(p, size)
          val shift = 64 - size * 8
          (if (size == 0) 0L else (raw << shift) >> shift, p + size)
        case 10 =>
          val bytes = java.util.Arrays.copyOfRange(data, base + p, base + p + size)
          (BigInt(1, if (bytes.isEmpty) Array(0.toByte) else bytes), p + size)
        case 7 =>
          var q = p
          val m = Map.newBuilder[String, Any]
          var i = 0
          while (i < size) {
            val (k, q1) = decode(q)
            val (v, q2) = decode(q1)
            m += (k.asInstanceOf[String] -> v)
            q = q2
            i += 1
          }
          (m.result(), q)
        case 11 =>
          var q = p
          val b = Vector.newBuilder[Any]
          var i = 0
          while (i < size) {
            val (v, q1) = decode(q)
            b += v
            q = q1
            i += 1
          }
          (b.result(), q)
        case 14 => (size == 1, p)
        case 15 =>
          (java.lang.Float.intBitsToFloat(beUint(p, 4).toInt).toDouble, p + 4)
        case other =>
          throw new IllegalArgumentException(s"mmdb: unsupported type $other")
      }
    }
  }

  // ---- tree enumeration ----

  /** IPv4 range table from an mmdb City database. For `ip_version == 6`
    * trees the IPv4 space lives under the 96-zero-bit prefix (the spec's
    * v4-in-v6 embedding) — the walk descends those 96 left edges first. */
  def readAll(data: Array[Byte], lang: String = "zh-CN"): Seq[IpRange] = {
    val t = open(data)
    var start = 0L
    // descend to the IPv4 subtree root in an IPv6 tree
    var node = 0L
    var i = 0
    while (t.ipVersion == 6 && i < 96 && node < t.nodeCount) {
      node = t.record(node.toInt, 0); i += 1
    }
    val out = new ArrayBuffer[IpRange]
    if (node < t.nodeCount) enumerate(t, node.toInt, 0L, 0, 32, lang, out)
    else if (node > t.nodeCount) // whole v4 space shares one record
      emit(t, node, 0L, 0, 32, lang, out)
    out.toSeq
  }

  /** Top-64-bit IPv6 range table in the [[Zxipv6Converter]] key scheme:
    * the probe side ([[Zxipv6Converter.Ipv6ToLongHi]]) maps unsigned
    * top-64 bits through `mapKey` (`^ Long.MinValue`), so the range keys
    * MUST live in the same mapped domain or the binsearch never matches
    * — and mapping (instead of dropping negatives) also keeps
    * above-8000:: space (fc00::, fe80::) addressable. */
  def readAllV6(data: Array[Byte], lang: String = "zh-CN"): Seq[IpRange] = {
    val t = open(data)
    require(t.ipVersion == 6, s"mmdb: ip_version ${t.ipVersion} has no IPv6 tree")
    val out = new ArrayBuffer[IpRange]
    enumerate(t, 0, 0L, 0, 64, lang, out)
    out.toSeq.map(r => r.copy(
      start = Zxipv6Converter.mapKey(r.start),
      end = Zxipv6Converter.mapKey(r.end)))
  }

  private final case class Tree(
      data: Array[Byte], nodeCount: Long, recordBits: Int, ipVersion: Int,
      dataDecoder: Decoder) {
    def record(node: Int, side: Int): Long = {
      def u8(i: Int): Int = data(i) & 0xff
      recordBits match {
        case 24 =>
          val o = node * 6 + side * 3
          (u8(o).toLong << 16) | (u8(o + 1) << 8) | u8(o + 2)
        case 28 =>
          val o = node * 7
          val mid = u8(o + 3)
          if (side == 0)
            ((mid & 0xf0).toLong << 20) | (u8(o).toLong << 16) | (u8(o + 1) << 8) | u8(o + 2)
          else
            ((mid & 0x0f).toLong << 24) | (u8(o + 4).toLong << 16) | (u8(o + 5) << 8) | u8(o + 6)
        case 32 =>
          val o = node * 8 + side * 4
          (u8(o).toLong << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3)
        case other =>
          throw new IllegalArgumentException(s"mmdb: record_size $other")
      }
    }
  }

  private def open(data: Array[Byte]): Tree = {
    val mi = markerIndex(data)
    require(mi >= 0, "not an mmdb file (metadata marker missing)")
    val metaStart = mi + Marker.length
    val meta = new Decoder(data, metaStart).decode(0)._1
      .asInstanceOf[Map[String, Any]]
    val nodeCount = meta("node_count").asInstanceOf[Long]
    val recordBits = meta("record_size").asInstanceOf[Long].toInt
    val ipVersion = meta("ip_version").asInstanceOf[Long].toInt
    val treeSize = (nodeCount * recordBits * 2 / 8).toInt
    // data section starts after a 16-byte zero separator
    Tree(data, nodeCount, recordBits, ipVersion, new Decoder(data, treeSize + 16))
  }

  /** DFS over the subtree: `prefix` holds `depth` decided bits
    * (low-aligned); `width` is the enumerated address width (32 or 64). */
  private def enumerate(
      t: Tree, node: Int, prefix: Long, depth: Int, width: Int,
      lang: String, out: ArrayBuffer[IpRange]): Unit = {
    var side = 0
    while (side < 2) {
      val r = t.record(node, side)
      val childPrefix = (prefix << 1) | side
      if (r < t.nodeCount) {
        if (depth + 1 < width)
          enumerate(t, r.toInt, childPrefix, depth + 1, width, lang, out)
        else // tree deeper than the enumerated width: take the leftmost
          emit(t, descendLeft(t, r), childPrefix, depth + 1, width, lang, out)
      } else if (r > t.nodeCount) {
        emit(t, r, childPrefix, depth + 1, width, lang, out)
      } // r == nodeCount: no data
      side += 1
    }
  }

  private def descendLeft(t: Tree, node: Long): Long = {
    var n = node
    while (n < t.nodeCount) n = t.record(n.toInt, 0)
    n
  }

  private def emit(
      t: Tree, record: Long, prefix: Long, depth: Int, width: Int,
      lang: String, out: ArrayBuffer[IpRange]): Unit = {
    if (record == t.nodeCount) return
    val rel = (record - t.nodeCount - 16).toInt
    val value = t.dataDecoder.decode(rel)._1.asInstanceOf[Map[String, Any]]
    val (country, city) = render(value, lang)
    if (country.isEmpty && city.isEmpty) return
    val span = width - depth
    val start = prefix << span
    val end = start + (if (span == 0) 0L else (1L << span) - 1)
    out += IpRange(start, end, country, city)
  }

  /** geoip.go:50-73: lang falls back to zh-CN unless the country-names
    * map carries the requested one; city uses the same resolved lang. */
  private def render(record: Map[String, Any], lang: String): (String, String) = {
    def names(key: String): Map[String, Any] = record.get(key) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        .get("names") match {
          case Some(n: Map[_, _]) => n.asInstanceOf[Map[String, Any]]
          case _ => Map.empty
        }
      case _ => Map.empty
    }
    val countryNames = names("country")
    val resolved = if (countryNames.contains(lang)) lang else "zh-CN"
    val country = countryNames.getOrElse(resolved, "").asInstanceOf[String]
    val city = names("city").getOrElse(resolved, "").asInstanceOf[String]
    (country, city)
  }

  def readFile(path: String, lang: String = "zh-CN"): Seq[IpRange] =
    readAll(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), lang)
}
