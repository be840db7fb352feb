package graft.functions

import java.time._
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, ResolverStyle, SignStyle, TextStyle}
import java.time.temporal.ChronoField

/** Multi-layout datetime detection — the engine's version of the
  * reference's 26-layout chain (parser/parser.go:29-63) plus its
  * `UnixFloat` epoch-number path (parser/parser.go:199-207).
  *
  * Go reference-time layouts are translated token-by-token into
  * `DateTimeFormatter`s (Go `2006-01-02T15:04:05Z07:00` →
  * `uuuu-MM-dd'T'HH:mm:ssXXX` etc.). Go's parser accepts optional
  * fractional seconds after `:05` even when the layout lacks them, so an
  * optional nano-fraction is appended after every seconds token. Layouts
  * without a zone are interpreted in the configured source timezone and
  * normalized to UTC (parser/parser.go:139-168).
  */
object GoTimeLayouts {

  /** The reference's layout list, in detection order. */
  val goLayouts: Seq[String] = Seq(
    "2006-01-02T15:04:05Z07:00",
    "2006-01-02T15:04:05Z0700",
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05Z07:00",
    "2006-01-02 15:04:05Z0700",
    "2006-01-02 15:04:05",
    "Mon Jan _2 15:04:05 2006",
    "Mon Jan _2 15:04:05 MST 2006",
    "Mon Jan 02 15:04:05 -0700 2006",
    "02 Jan 06 15:04 MST",
    "02 Jan 06 15:04 -0700",
    "Monday, 02-Jan-06 15:04:05 MST",
    "Mon, 02 Jan 2006 15:04:05 MST",
    "Mon, 02 Jan 2006 15:04:05 -0700",
    "Mon Jan 02 15:04:05 MST 2006",
    "Mon 02 Jan 2006 03:04:05 PM MST",
    "Jan 02, 2006 15:04:05Z07:00",
    "Jan 02, 2006 15:04:05Z0700",
    "Jan 02, 2006 15:04:05",
    "02/Jan/2006 15:04:05 Z07:00",
    "02/Jan/2006 15:04:05 Z0700",
    "02/Jan/2006 15:04:05",
    "2006-01-02",
    "02/01/2006",
    "02/Jan/2006",
    "Jan 02, 2006",
    "Mon Jan 02, 2006")

  /** Epoch in micros — the non-nullable default for DateTime columns. */
  val EpochMicros: Long = 0L

  /** Whether a translated layout carries its own zone/offset. */
  private final case class Layout(fmt: DateTimeFormatter, hasZone: Boolean, hasTime: Boolean)

  private val goTokens: Seq[String] = Seq(
    // longest-match-first: "January"/"Monday" MUST precede their "Jan"/
    // "Mon" prefixes or the find() matches the short form and treats the
    // tail ("uary"/"day") as literals, rejecting every other month/day
    "2006", "Monday", "Mon", "January", "Jan", "_2", "02", "01", "15", "03",
    "04", "05", "06", "PM", "Z07:00", "Z0700", "-07:00", "-0700", "MST")

  private def translate(go: String): Layout = {
    val b = new DateTimeFormatterBuilder().parseCaseSensitive()
    var hasZone = false
    var hasTime = false
    var i = 0
    while (i < go.length) {
      goTokens.find(t => go.startsWith(t, i)) match {
        case Some(tok) =>
          tok match {
            case "2006" => b.appendValue(ChronoField.YEAR, 4, 4, SignStyle.NEVER)
            case "06" => b.appendValueReduced(ChronoField.YEAR, 2, 2, 1969)
            case "01" => b.appendValue(ChronoField.MONTH_OF_YEAR, 2)
            case "Jan" => b.appendText(ChronoField.MONTH_OF_YEAR, TextStyle.SHORT)
            case "January" => b.appendText(ChronoField.MONTH_OF_YEAR, TextStyle.FULL)
            case "02" => b.appendValue(ChronoField.DAY_OF_MONTH, 2)
            case "_2" => b.padNext(2).appendValue(ChronoField.DAY_OF_MONTH)
            case "Mon" => b.appendText(ChronoField.DAY_OF_WEEK, TextStyle.SHORT)
            case "Monday" => b.appendText(ChronoField.DAY_OF_WEEK, TextStyle.FULL)
            case "15" => hasTime = true; b.appendValue(ChronoField.HOUR_OF_DAY, 2)
            case "03" => hasTime = true; b.appendValue(ChronoField.CLOCK_HOUR_OF_AMPM, 2)
            case "04" => b.appendValue(ChronoField.MINUTE_OF_HOUR, 2)
            case "05" =>
              // Go accepts fractional seconds after :05 even when the
              // layout has none.
              b.appendValue(ChronoField.SECOND_OF_MINUTE, 2)
              b.appendFraction(ChronoField.NANO_OF_SECOND, 0, 9, true)
            case "PM" => b.appendText(ChronoField.AMPM_OF_DAY, TextStyle.SHORT)
            case "Z07:00" => hasZone = true; b.appendOffset("+HH:MM", "Z")
            case "Z0700" => hasZone = true; b.appendOffset("+HHMM", "Z")
            case "-07:00" => hasZone = true; b.appendOffset("+HH:MM", "+00:00")
            case "-0700" => hasZone = true; b.appendOffset("+HHMM", "+0000")
            case "MST" => hasZone = true; b.appendZoneText(TextStyle.SHORT)
          }
          i += tok.length
        case None =>
          b.appendLiteral(go.charAt(i))
          i += 1
      }
    }
    Layout(b.toFormatter(java.util.Locale.US).withResolverStyle(ResolverStyle.SMART),
      hasZone, hasTime)
  }

  private val layouts: Array[Layout] = goLayouts.map(translate).toArray

  val layoutCount: Int = layouts.length

  /** Parse with one specific layout (the memoized fast path,
    * parser/parser.go:139-168). Returns epoch micros (UTC). */
  def parseWithLayout(idx: Int, s: String, tz: ZoneId): Option[Long] = {
    val l = layouts(idx)
    try {
      val parsed = l.fmt.parse(s)
      val date = LocalDate.from(parsed)
      val time = if (l.hasTime) LocalTime.from(parsed) else LocalTime.MIDNIGHT
      val ldt = LocalDateTime.of(date, time)
      val instant =
        if (l.hasZone) {
          val zone = try ZoneId.from(parsed) catch {
            case _: Exception => ZoneOffset.ofTotalSeconds(
              parsed.get(ChronoField.OFFSET_SECONDS))
          }
          ldt.atZone(zone).toInstant
        } else ldt.atZone(tz).toInstant
      Some(Math.multiplyExact(instant.getEpochSecond, 1000000L) + instant.getNano / 1000L)
    } catch {
      case _: Exception => None
    }
  }

  /** Try every layout in order; first hit wins (`parseInLocation`,
    * parser/parser.go:186-197). Returns (epochMicros, layoutIdx). */
  def detect(s: String, tz: ZoneId): Option[(Long, Int)] = {
    var i = 0
    while (i < layouts.length) {
      parseWithLayout(i, s, tz) match {
        case Some(us) => return Some((us, i))
        case None =>
      }
      i += 1
    }
    None
  }

  /** `UnixFloat(sec, unit)` (parser/parser.go:199-207): scale by the
    * configured time unit; outside [0, 2^32) seconds → Epoch. Micros. */
  def unixFloat(sec: Double, unit: Double): Long = {
    val s = sec * unit
    if (s < 0 || s >= 4294967296.0 || s.isNaN) EpochMicros
    else {
      // mirror Go: int64 part + int64(frac*1e9) nanos, truncated to micros
      val i = s.toLong
      val f = s - i
      i * 1000000L + (f * 1e9).toLong / 1000L
    }
  }
}
