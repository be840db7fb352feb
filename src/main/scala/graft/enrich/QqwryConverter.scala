package graft.enrich

import java.nio.charset.Charset

import scala.collection.mutable.ArrayBuffer

/** Offline converter for the qqwry.dat IPv4 geo database
  * (ipHandle/pkg/qqwry/qqwry.go:63-149, byte readers
  * ipHandle/pkg/common/struct.go:28-90): walks the little-endian index,
  * follows the two redirect modes, GBK-decodes country/area, and scrubs
  * the `" CZ88.NET"` filler — producing the sorted [[IpRange]] table the
  * broadcast binsearch lookup consumes. Runs once at pipeline build time
  * (driver side), never per row.
  *
  * Layout: header = [idxStart u32 LE][idxEnd u32 LE]; index entries of 7
  * bytes = [startIp u32 LE][record u24 LE]; record = [endIp u32 LE]
  * [country/area], where a 0x01 byte redirects both strings and a 0x02
  * byte redirects one string, strings are NUL-terminated GBK.
  */
object QqwryConverter {

  private val RedirectMode1: Int = 0x01
  private val RedirectMode2: Int = 0x02
  private val Gbk: Charset = Charset.forName("GBK")

  def readAll(data: Array[Byte]): Seq[IpRange] = {
    def u8(off: Int): Int = data(off) & 0xff
    def u24(off: Int): Int = u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16)
    def u32(off: Int): Long =
      (u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3).toLong << 24)) & 0xffffffffL

    def cstring(off: Int): (String, Int) = {
      var end = off
      while (end < data.length && data(end) != 0) end += 1
      (new String(data, off, end - off, Gbk), end + 1)
    }

    def scrub(s: String): String = s.replace(" CZ88.NET", "")

    def readArea(off: Int): String = u8(off) match {
      case RedirectMode1 | RedirectMode2 =>
        val areaOffset = u24(off + 1)
        if (areaOffset == 0) "" else cstring(areaOffset)._1
      case _ => cstring(off)._1
    }

    val idxStart = u32(0).toInt
    val idxEnd = u32(4).toInt
    val out = ArrayBuffer.empty[IpRange]
    var idx = idxStart
    while (idx <= idxEnd) {
      val startIp = u32(idx)
      val rec = u24(idx + 4)
      val endIp = u32(rec)
      // country/area start at rec+4 (qqwry.go:82-103)
      val (country, area) = u8(rec + 4) match {
        case RedirectMode1 =>
          val countryOffset = u24(rec + 5)
          u8(countryOffset) match {
            case RedirectMode2 =>
              val (c, _) = cstring(u24(countryOffset + 1))
              (c, readArea(countryOffset + 4))
            case _ =>
              val (c, next) = cstring(countryOffset)
              (c, readArea(next))
          }
        case RedirectMode2 =>
          val (c, _) = cstring(u24(rec + 5))
          (c, readArea(rec + 8))
        case _ =>
          val (c, next) = cstring(rec + 4)
          (c, readArea(next))
      }

      out += IpRange(startIp, endIp, scrub(country), scrub(area))
      idx += 7
    }
    out.sortBy(_.start).toSeq
  }

  def readFile(path: String): Seq[IpRange] =
    readAll(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
