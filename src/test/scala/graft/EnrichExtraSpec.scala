package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.{Cdn, EntityExtract, QqwryConverter}

/** Entity extraction (ipHandle/entity/parse.go + re.go), CDN lookup
  * (cdn.go:62-87), and the qqwry.dat binary converter (qqwry.go:63-149)
  * over a synthetic database file. */
class EnrichExtraSpec extends AnyFunSuite {

  test("entity extraction: ipv4 wins the overlapping domain match") {
    val es = EntityExtract.extract("connect to 10.1.2.3 via cdn.example.com ok")
    assert(es.map(e => (e.etype, e.text)) === Seq(
      ("ipv4", "10.1.2.3"), ("domain", "cdn.example.com")))
  }

  test("entity extraction: ipv6 forms") {
    val es = EntityExtract.extract("peer 2001:db8:0:0:0:0:0:1 and fe80::1%eth0 done")
    assert(es.map(_.etype) === Seq("ipv6", "ipv6"))
    assert(es.head.text === "2001:db8:0:0:0:0:0:1")
    assert(es(1).text === "fe80::1%eth0")
  }

  test("entity extraction: positions and non-overlap") {
    val es = EntityExtract.extract("1.2.3.4 x 5.6.7.8")
    assert(es.map(_.text) === Seq("1.2.3.4", "5.6.7.8"))
    assert(es.map(_.start) === Seq(0, 10))
    assert(EntityExtract.extract("no entities here at all%%%") === Seq.empty)
  }

  test("cdn: base domain reduction + kunlun fallback") {
    val data = Map("example.com" -> "SomeCDN", "cdn.net" -> "OtherCDN")
    assert(Cdn.find(data, "a.b.example.com") === Some("SomeCDN"))
    assert(Cdn.find(data, "cdn.net") === Some("OtherCDN"))
    assert(Cdn.find(data, "x.kunlunchi.com") === Some("阿里云 CDN"))
    assert(Cdn.find(data, "unknown.org") === None)
    assert(Cdn.baseCname("single") === "single")
  }

  /** Build a minimal qqwry.dat: 2 ranges, exercising the direct-string
    * mode and RedirectMode2 for the country, GBK bytes, CZ88 scrub. */
  test("qqwry converter reads the binary format") {
    val gbk = java.nio.charset.Charset.forName("GBK")
    val buf = new ByteArrayOutputStream()
    def u32le(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u24le(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)

    // layout plan:
    // 0..7    header
    // 8..     record region
    // then    index region
    val records = new ByteArrayOutputStream()
    val recBase = 8

    // record A (range [100, 199]): endIp + country "中国 CZ88.NET" + area "电信"
    val recA = recBase + records.size()
    records.write(u32le(199))
    records.write("中国 CZ88.NET".getBytes(gbk)); records.write(0)
    records.write("电信".getBytes(gbk)); records.write(0)

    // shared country string for record B
    val sharedCountry = recBase + records.size()
    records.write("美国".getBytes(gbk)); records.write(0)

    // record B (range [300, 399]): endIp + RedirectMode2 → sharedCountry,
    // area follows inline at rec+8
    val recB = recBase + records.size()
    records.write(u32le(399))
    records.write(0x02)
    records.write(u24le(sharedCountry))
    records.write("AT&T Chicago".getBytes(gbk)); records.write(0)

    val idxStart = recBase + records.size()
    val index = new ByteArrayOutputStream()
    index.write(u32le(100)); index.write(u24le(recA))
    index.write(u32le(300)); index.write(u24le(recB))
    val idxEnd = idxStart + 7 // offset of the LAST entry

    buf.write(u32le(idxStart)); buf.write(u32le(idxEnd))
    buf.write(records.toByteArray)
    buf.write(index.toByteArray)

    val ranges = QqwryConverter.readAll(buf.toByteArray)
    assert(ranges === Seq(
      graft.enrich.IpRange(100, 199, "中国", "电信"),
      graft.enrich.IpRange(300, 399, "美国", "AT&T Chicago")))
  }
}
