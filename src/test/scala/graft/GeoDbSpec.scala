package graft

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.{GeoDb, IpEnrich, IpdbConverter, MmdbConverter}

/** Synthetic MaxMind DB writer for the converter specs: encodes the
  * public mmdb format (search tree of configurable record size, 16-byte
  * separator, typed data section, marker + metadata map) from a list of
  * (bit-path, data-record) networks. Bit paths are '0'/'1' strings so
  * the 96-bit v4-in-v6 embedding needs no >64-bit arithmetic.
  */
object MmdbTestDb {
  def encStr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length < 29)
    (((2 << 5) | b.length).toByte) +: b
  }

  def encUint(v: Long): Array[Byte] = {
    val bytes = ArrayBuffer.empty[Byte]
    var x = v
    while (x != 0) { bytes.prepend((x & 0xff).toByte); x >>>= 8 }
    (((6 << 5) | bytes.length).toByte) +: bytes.toArray
  }

  def encMap(pairs: (String, Array[Byte])*): Array[Byte] =
    (((7 << 5) | pairs.length).toByte) +:
      pairs.toArray.flatMap { case (k, v) => encStr(k) ++ v }

  /** Pointer (type 1, SS=1) to a data-section offset in [2048, 2^19+2048). */
  def encPtr1(off: Int): Array[Byte] = {
    require(off >= 2048 && off < (1 << 19) + 2048)
    val v = off - 2048
    Array((((1 << 5) | (1 << 3) | ((v >> 16) & 0x7)).toByte),
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  }

  /** Pointer (type 1, SS=0) to a data-section offset < 2048. */
  def encPtr(off: Int): Array[Byte] = {
    require(off >= 0 && off < 2048)
    Array((((1 << 5) | ((off >> 8) & 0x7)).toByte), (off & 0xff).toByte)
  }

  /** City-record map: country/city names keyed by language. */
  def cityRecord(country: Map[String, String], city: Map[String, String]): Array[Byte] = {
    def names(m: Map[String, String]) =
      encMap("names" -> encMap(m.toSeq.map { case (k, v) => k -> encStr(v) }: _*))
    if (city.isEmpty) encMap("country" -> names(country))
    else encMap("country" -> names(country), "city" -> names(city))
  }

  private val Marker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++ "MaxMind.com".getBytes(UTF_8)

  /** networks: (bit path from the tree root, index into dataRecords). */
  def build(
      networks: Seq[(String, Int)], dataRecords: Seq[Array[Byte]],
      recordSize: Int = 24, ipVersion: Int = 4): Array[Byte] = {
    // trie with placeholders: -1 empty, -1000-k data k, >=0 child index
    val nodes = ArrayBuffer[Array[Int]](Array(-1, -1))
    for ((path, dataIdx) <- networks) {
      var cur = 0
      for (i <- path.indices) {
        val bit = path.charAt(i) - '0'
        if (i == path.length - 1) nodes(cur)(bit) = -1000 - dataIdx
        else nodes(cur)(bit) match {
          case c if c >= 0 => cur = c
          case -1 =>
            nodes += Array(-1, -1)
            nodes(cur)(bit) = nodes.length - 1
            cur = nodes.length - 1
          case _ => sys.error(s"network under an existing leaf: $path")
        }
      }
    }
    val nodeCount = nodes.length
    val dataOffsets = ArrayBuffer.empty[Int]
    val dataSec = ArrayBuffer.empty[Byte]
    dataRecords.foreach { r => dataOffsets += dataSec.length; dataSec ++= r }
    def recVal(v: Int): Int =
      if (v == -1) nodeCount
      else if (v <= -1000) nodeCount + 16 + dataOffsets(-1000 - v)
      else v
    def be(v: Int, n: Int): Array[Byte] =
      (1 to n).map(i => ((v >> ((n - i) * 8)) & 0xff).toByte).toArray
    val tree = ArrayBuffer.empty[Byte]
    for (n <- nodes) {
      val l = recVal(n(0)); val r = recVal(n(1))
      recordSize match {
        case 24 => tree ++= be(l, 3) ++ be(r, 3)
        case 28 =>
          tree ++= be(l & 0xffffff, 3)
          tree += (((l >> 24) & 0xf) << 4 | ((r >> 24) & 0xf)).toByte
          tree ++= be(r & 0xffffff, 3)
        case 32 => tree ++= be(l, 4) ++ be(r, 4)
      }
    }
    val meta = encMap(
      "node_count" -> encUint(nodeCount),
      "record_size" -> encUint(recordSize),
      "ip_version" -> encUint(ipVersion),
      "database_type" -> encStr("GeoLite2-City"))
    tree.toArray ++ Array.fill[Byte](16)(0) ++ dataSec.toArray ++ Marker ++ meta
  }
}

/** Synthetic ipip.net ipdb writer: 4-byte meta length + JSON metadata +
  * 8-byte trie nodes + length-prefixed tab-joined data records. */
object IpdbTestDb {
  def build(networks: Seq[(String, Int)], records: Seq[Seq[String]]): Array[Byte] = {
    val nodes = ArrayBuffer[Array[Int]](Array(-1, -1))
    for ((path, dataIdx) <- networks) {
      var cur = 0
      for (i <- path.indices) {
        val bit = path.charAt(i) - '0'
        if (i == path.length - 1) nodes(cur)(bit) = -1000 - dataIdx
        else nodes(cur)(bit) match {
          case c if c >= 0 => cur = c
          case -1 =>
            nodes += Array(-1, -1)
            nodes(cur)(bit) = nodes.length - 1
            cur = nodes.length - 1
          case _ => sys.error(s"network under an existing leaf: $path")
        }
      }
    }
    val nodeCount = nodes.length
    val dataOffsets = ArrayBuffer.empty[Int]
    val dataSec = ArrayBuffer.empty[Byte]
    dataSec += 0 += 0 // offset 0 would collide with the no-data sentinel
    records.foreach { r =>
      val b = r.mkString("\t").getBytes(UTF_8)
      dataOffsets += dataSec.length
      dataSec += ((b.length >> 8) & 0xff).toByte += (b.length & 0xff).toByte
      dataSec ++= b
    }
    // leaf value v: resolved data offset = v - nodeCount + nodeCount*8
    def recVal(v: Int): Int =
      if (v == -1) nodeCount
      else if (v <= -1000) nodeCount + dataOffsets(-1000 - v)
      else v
    val body = ArrayBuffer.empty[Byte]
    for (n <- nodes; v <- Seq(recVal(n(0)), recVal(n(1))))
      body ++= (1 to 4).map(i => ((v >> ((4 - i) * 8)) & 0xff).toByte)
    body ++= dataSec
    val meta = ("""{"build":1700000000,"ip_version":1,"node_count":""" + nodeCount +
      ""","languages":{"CN":0},"fields":["country_name","region_name","city_name"],""" +
      """"total_size":""" + body.length + "}").getBytes(UTF_8)
    Array(
      ((meta.length >> 24) & 0xff).toByte, ((meta.length >> 16) & 0xff).toByte,
      ((meta.length >> 8) & 0xff).toByte, (meta.length & 0xff).toByte) ++
      meta ++ body
  }
}

/** E6 vendor geo DBs: mmdb + ipdb readers over synthetic databases, the
  * reference's language fallback, and NALI_DB_IP4 selection by content.
  */
class GeoDbSpec extends SparkSuite {

  private def bits(v: Long, len: Int): String =
    (1 to len).map(i => ((v >> (len - i)) & 1).toString).mkString

  // 1.0.0.0/8 (中国 北京 / China Beijing), 2.0.0.0/8 (美国, no city)
  private val recCn = MmdbTestDb.cityRecord(
    Map("zh-CN" -> "中国", "en" -> "China"),
    Map("zh-CN" -> "北京", "en" -> "Beijing"))
  private val recUs = MmdbTestDb.cityRecord(Map("zh-CN" -> "美国"), Map.empty)
  private val v4Networks = Seq(bits(1, 8) -> 0, bits(2, 8) -> 1)

  test("mmdb: ipv4 tree enumerates to sorted ranges with zh-CN names") {
    val db = MmdbTestDb.build(v4Networks, Seq(recCn, recUs))
    assert(MmdbConverter.isMmdb(db))
    val ranges = MmdbConverter.readAll(db)
    assert(ranges === Seq(
      graft.enrich.IpRange(0x01000000L, 0x01ffffffL, "中国", "北京"),
      graft.enrich.IpRange(0x02000000L, 0x02ffffffL, "美国", "")))
  }

  test("mmdb: language fallback per record (geoip.go:50-55)") {
    val db = MmdbTestDb.build(v4Networks, Seq(recCn, recUs))
    val en = MmdbConverter.readAll(db, lang = "en")
    // record 1 has en names; record 2 falls back to zh-CN
    assert(en.map(r => (r.country, r.area)) ===
      Seq(("China", "Beijing"), ("美国", "")))
  }

  test("mmdb: record sizes 28 and 32 decode identically") {
    for (rs <- Seq(28, 32)) {
      val db = MmdbTestDb.build(v4Networks, Seq(recCn, recUs), recordSize = rs)
      assert(MmdbConverter.readAll(db).map(_.country) === Seq("中国", "美国"), s"rs=$rs")
    }
  }

  test("mmdb: ipv6 tree reaches the v4 subtree through 96 zero bits") {
    val nets6 = v4Networks.map { case (p, d) => ("0" * 96 + p, d) }
    val db = MmdbTestDb.build(nets6, Seq(recCn, recUs), ipVersion = 6)
    assert(MmdbConverter.readAll(db).map(_.country) === Seq("中国", "美国"))
  }

  test("mmdb: readAllV6 enumerates top-64-bit ranges (zx key scheme)") {
    import graft.enrich.Zxipv6Converter.mapKey
    // 2001:db8::/32 — the documentation prefix
    val prefix32 = bits(0x20010db8L, 32)
    val db = MmdbTestDb.build(Seq(prefix32 -> 0), Seq(recCn), ipVersion = 6)
    val ranges = MmdbConverter.readAllV6(db)
    // keys live in the PROBE side's mapped domain (mapKey = ^MinValue):
    // raw keys would make every Ipv6ToLongHi probe miss
    assert(ranges === Seq(graft.enrich.IpRange(
      mapKey(0x20010db8L << 32), mapKey((0x20010db8L << 32) | 0xffffffffL),
      "中国", "北京")))
    // end-to-end: the probe expression's key for an address in the range
    // falls inside [start, end]
    val probe = mapKey(0x20010db80000abcdL)
    assert(ranges.head.start <= probe && probe <= ranges.head.end)
  }

  test("mmdb: readAllV6 keeps above-8000:: space (fc00::) addressable") {
    import graft.enrich.Zxipv6Converter.mapKey
    val db = MmdbTestDb.build(Seq(bits(0xfc00L, 16) -> 0), Seq(recCn),
      ipVersion = 6)
    val ranges = MmdbConverter.readAllV6(db)
    assert(ranges.length === 1)
    val probe = mapKey(0xfc00123400000000L)
    assert(ranges.head.start <= probe && probe <= ranges.head.end)
  }

  test("mmdb: ss=1 pointer bias is added AFTER the or (carry past bit 16)") {
    // target = ((vvv<<16) | payload) + 2048 with vvv=1, payload=0xF900
    // -> 0x20100. The precedence bug (payload+2048 before the or) loses
    // the carry and resolves 65536 short, decoding filler garbage.
    val target = ((1 << 16) | 0xF900) + 2048
    val filler = Array.fill[Byte](target)(0) // never decoded
    val ptrRec = MmdbTestDb.encPtr1(target) // recCn sits at offset=target
    val db = MmdbTestDb.build(
      Seq(bits(1, 8) -> 2), Seq(filler, recCn, ptrRec))
    val ranges = MmdbConverter.readAll(db)
    assert(ranges.map(r => (r.start >> 24, r.country, r.area)) ===
      Seq((1L, "中国", "北京")))
  }

  test("mmdb: pointer values resolve into the data section") {
    // record 1 sits at data offset 0; record for 3.0.0.0/8 points at it
    val ptrRec = MmdbTestDb.encPtr(0)
    val db = MmdbTestDb.build(
      Seq(bits(1, 8) -> 0, bits(3, 8) -> 1), Seq(recCn, ptrRec))
    val ranges = MmdbConverter.readAll(db)
    assert(ranges.map(r => (r.start >> 24, r.country, r.area)) ===
      Seq((1L, "中国", "北京"), (3L, "中国", "北京")))
  }

  test("mmdb ranges feed the broadcast binsearch lookup end-to-end") {
    import spark.implicits._
    val db = MmdbTestDb.build(v4Networks, Seq(recCn, recUs))
    val ranges = MmdbConverter.readAll(db)
    val df = Seq("1.2.3.4", "2.3.4.5", "9.9.9.9").toDF("ip_src")
    val got = IpEnrich.searchIp(df, ranges, objs = Seq("src"))
      .select("ip_src", "loc_src", "isp_src").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq(
      ("1.2.3.4", "中国", "北京"),
      ("2.3.4.5", "美国", "未知"), // no city → single token → isp 未知
      ("9.9.9.9", "未知", "未知")))
  }

  test("ipdb: v4-mapped tree, CN fields, Region City render (ipipfree.go:38-62)") {
    val v4Root = "0" * 80 + "1" * 16
    val db = IpdbTestDb.build(
      Seq(v4Root + bits(1, 8) -> 0, v4Root + bits(2, 8) -> 1),
      Seq(Seq("中国", "北京", "北京"), Seq("美国", "加州", "")))
    assert(IpdbConverter.isIpdb(db))
    assert(!MmdbConverter.isMmdb(db))
    val ranges = IpdbConverter.readAll(db)
    assert(ranges === Seq(
      graft.enrich.IpRange(0x01000000L, 0x01ffffffL, "中国", "北京 北京"),
      graft.enrich.IpRange(0x02000000L, 0x02ffffffL, "美国", "加州")))
  }

  test("GeoDb: NALI_DB_IP4 selects the converter by file content") {
    val dir = java.nio.file.Files.createTempDirectory("geodb").toFile
    dir.deleteOnExit()
    val mmdbPath = new java.io.File(dir, "GeoLite2-City.mmdb")
    java.nio.file.Files.write(mmdbPath.toPath,
      MmdbTestDb.build(v4Networks, Seq(recCn, recUs)))
    val viaMmdb = GeoDb.loadIpv4(Map("NALI_DB_IP4" -> mmdbPath.getPath))
    assert(viaMmdb.get.map(_.country) === Seq("中国", "美国"))
    val viaMmdbEn = GeoDb.loadIpv4(
      Map("NALI_DB_IP4" -> mmdbPath.getPath, "NALI_LANG" -> "en"))
    assert(viaMmdbEn.get.head.country === "China")

    val ipdbPath = new java.io.File(dir, "ipipfree.ipdb")
    val v4Root = "0" * 80 + "1" * 16
    java.nio.file.Files.write(ipdbPath.toPath,
      IpdbTestDb.build(Seq(v4Root + bits(7, 8) -> 0), Seq(Seq("日本", "东京", ""))))
    val viaIpdb = GeoDb.loadIpv4(Map("NALI_DB_IP4" -> ipdbPath.getPath))
    assert(viaIpdb.get === Seq(
      graft.enrich.IpRange(0x07000000L, 0x07ffffffL, "日本", "东京")))

    assert(GeoDb.loadIpv4(Map.empty).isEmpty)
  }
}
