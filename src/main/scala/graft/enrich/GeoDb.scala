package graft.enrich

/** Geo database selection (ipHandle/db/db.go:29-93): the reference picks
  * DB files via `NALI_DB_IP4` / `NALI_DB_IP6` (falling back to qqwry /
  * zxipv6wry in its data dir) and dispatches by format. Here the two
  * pure-binary formats are supported natively via the offline converters;
  * mmdb (GeoIP2) / ipdb (ipip.net) would need their vendor readers —
  * plug a converter returning [[IpRange]]s to add one.
  */
object GeoDb {

  type Converter = Array[Byte] => Seq[IpRange]

  /** Registered format converters, probed in order. */
  val converters: Seq[(String, Converter)] = Seq(
    "qqwry" -> QqwryConverter.readAll,
    "zxipv6wry" -> Zxipv6Converter.readAll)

  def loadIpv4(env: Map[String, String] = sys.env): Option[Seq[IpRange]] =
    env.get("NALI_DB_IP4").map(QqwryConverter.readFile)

  def loadIpv6(env: Map[String, String] = sys.env): Option[Seq[IpRange]] =
    env.get("NALI_DB_IP6").map(Zxipv6Converter.readFile)
}
