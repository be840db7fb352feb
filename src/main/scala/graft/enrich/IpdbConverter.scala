package graft.enrich

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import graft.sources.{JValue, JsonParser}

/** Offline converter for ipip.net `.ipdb` City databases — the other E6
  * vendor format (ipHandle/pkg/ipip/ipipfree.go:50-63, selected via
  * `NALI_DB_IP4=ipip...`, db.go:83-84). Public format (the ipdb readers
  * are open source): a 4-byte big-endian metadata length, a JSON
  * metadata object (`node_count`, `languages` name→field-offset,
  * `fields`, `ip_version` bitmask), a binary trie of 8-byte nodes (two
  * big-endian int32 records), and a data area of length-prefixed
  * tab-joined field strings.
  *
  * Rendering parity (ipipfree.go:38-62): the reference always queries
  * language "CN" and renders `"Country Region City"` (city omitted when
  * empty) — here country goes to [[IpRange.country]] and
  * `"Region City"` (trimmed) to [[IpRange.area]], so the combined text
  * [[IpRangeLookup.splitLocIsp]] sees matches the reference's
  * `Result.String()`.
  */
object IpdbConverter {

  def isIpdb(data: Array[Byte]): Boolean = parseMeta(data).isDefined

  private final case class Meta(
      nodeCount: Int, langOffset: Int, nFields: Int, ipVersion: Int,
      bodyStart: Int)

  private def parseMeta(data: Array[Byte], lang: String = "CN"): Option[Meta] = {
    if (data.length < 8) return None
    val metaLen = ((data(0) & 0xff) << 24) | ((data(1) & 0xff) << 16) |
      ((data(2) & 0xff) << 8) | (data(3) & 0xff)
    if (metaLen <= 0 || 4 + metaLen > data.length) return None
    val json = new String(data, 4, metaLen, UTF_8)
    new JsonParser().parse(json) match {
      case Some(o: JValue.JObj) =>
        for {
          nc <- Option(o.get("node_count")).collect { case n: JValue.JNum => n }
          ncv <- nc.int64
          fields <- Option(o.get("fields")).collect { case JValue.JArr(a) => a }
        } yield {
          val langs = Option(o.get("languages")).collect {
            case l: JValue.JObj => l.fields.toSeq.map {
              case (k, n: JValue.JNum) => k -> n.int64.getOrElse(0L).toInt
              case (k, _) => k -> 0
            }
          }.getOrElse(Seq.empty)
          val off = langs.toMap.getOrElse(lang,
            langs.headOption.map(_._2).getOrElse(0))
          val ipv = Option(o.get("ip_version")).collect { case n: JValue.JNum => n }
            .flatMap(_.int64).getOrElse(1L).toInt
          Meta(ncv.toInt, off, fields.length, ipv, 4 + metaLen)
        }
      case _ => None
    }
  }

  /** IPv4 range table. The IPv4 subtree sits under the v4-mapped prefix
    * `::ffff:0:0/96` (80 zero bits then 16 one bits), matching the open
    * ipdb readers' `v4offset` walk. */
  def readAll(data: Array[Byte], lang: String = "CN"): Seq[IpRange] = {
    val meta = parseMeta(data, lang)
      .getOrElse(throw new IllegalArgumentException("not an ipdb file"))
    val body = meta.bodyStart
    def node(i: Int, side: Int): Int = {
      val o = body + i * 8 + side * 4
      ((data(o) & 0xff) << 24) | ((data(o + 1) & 0xff) << 16) |
        ((data(o + 2) & 0xff) << 8) | (data(o + 3) & 0xff)
    }
    // v4 root: 80 zero bits then 16 one bits
    var root = 0
    var i = 0
    while (i < 96 && root < meta.nodeCount) {
      root = node(root, if (i >= 80) 1 else 0)
      i += 1
    }

    def fieldsAt(leaf: Int): Array[String] = {
      val resolved = body + leaf - meta.nodeCount + meta.nodeCount * 8
      val size = ((data(resolved) & 0xff) << 8) | (data(resolved + 1) & 0xff)
      new String(data, resolved + 2, size, UTF_8).split("\t", -1)
    }

    val out = new ArrayBuffer[IpRange]
    def emit(leaf: Int, prefix: Long, depth: Int): Unit = {
      val f = fieldsAt(leaf)
      val country = if (meta.langOffset < f.length) f(meta.langOffset) else ""
      val region = if (meta.langOffset + 1 < f.length) f(meta.langOffset + 1) else ""
      val city = if (meta.langOffset + 2 < f.length) f(meta.langOffset + 2) else ""
      if (country.isEmpty && region.isEmpty && city.isEmpty) return
      val span = 32 - depth
      val start = prefix << span
      out += IpRange(start, start + (if (span == 0) 0L else (1L << span) - 1),
        country, (region + " " + city).trim)
    }
    def walk(n: Int, prefix: Long, depth: Int): Unit = {
      var side = 0
      while (side < 2) {
        val r = node(n, side)
        val p = (prefix << 1) | side
        if (r < meta.nodeCount) {
          if (depth + 1 <= 31) walk(r, p, depth + 1)
        } else if (r > meta.nodeCount) emit(r, p, depth + 1)
        // r == nodeCount: no data
        side += 1
      }
    }
    if (root < meta.nodeCount) walk(root, 0L, 0)
    else if (root > meta.nodeCount) emit(root, 0L, 0)
    out.toSeq
  }

  def readFile(path: String, lang: String = "CN"): Seq[IpRange] =
    readAll(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), lang)
}
