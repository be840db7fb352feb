package graft

import java.time.ZoneId

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GoTimeLayouts

/** Port of TestParseDateTime (parser/parser_test.go:522-607): every
  * supported layout across 4 source timezones, normalized to UTC.
  * Inputs containing the ambiguous "CST" zone abbreviation are tolerated
  * like the reference tolerates them (logged, not asserted).
  */
class GoTimeLayoutsSpec extends AnyFunSuite {
  import ParserFixtures._

  private val zones = Seq("UTC", "Asia/Shanghai", "Europe/Moscow", "America/Los_Angeles")

  private def cases(tz: String): Seq[(String, Long)] = Seq(
    // DateTime, RFC3339
    "2009-07-13T09:07:13.123+08:00" -> bdShNs,
    "2009-07-13T09:07:13.123+0800" -> bdShNs,
    "2009-07-13T09:07:13+08:00" -> bdShSec,
    "2009-07-13T09:07:13+0800" -> bdShSec,
    "2009-07-13T09:07:13.123Z" -> bdUtcNs,
    "2009-07-13T09:07:13Z" -> bdUtcSec,
    "2009-07-13T09:07:13.123" -> bdLocalNs(tz),
    "2009-07-13T09:07:13" -> bdLocalSec(tz),
    // DateTime, ISO8601
    "2009-07-13 09:07:13.123+08:00" -> bdShNs,
    "2009-07-13 09:07:13.123+0800" -> bdShNs,
    "2009-07-13 09:07:13+08:00" -> bdShSec,
    "2009-07-13 09:07:13+0800" -> bdShSec,
    "2009-07-13 09:07:13.123Z" -> bdUtcNs,
    "2009-07-13 09:07:13Z" -> bdUtcSec,
    "2009-07-13 09:07:13.123" -> bdLocalNs(tz),
    "2009-07-13 09:07:13" -> bdLocalSec(tz),
    // other layouts supported by golang
    "Mon Jul 13 09:07:13 2009" -> bdLocalSec(tz),
    "Mon Jul 13 09:07:13 CST 2009" -> bdShSec,
    "Mon Jul 13 09:07:13 +0800 2009" -> bdShSec,
    "13 Jul 09 09:07 CST" -> bdShMin,
    "13 Jul 09 09:07 +0800" -> bdShMin,
    "Monday, 13-Jul-09 09:07:13 CST" -> bdShSec,
    "Mon, 13 Jul 2009 09:07:13 CST" -> bdShSec,
    "Mon, 13 Jul 2009 09:07:13 +0800" -> bdShSec,
    // linux utils
    "Mon 13 Jul 2009 09:07:13 AM CST" -> bdShSec,
    // home-brewed
    "Jul 13, 2009 09:07:13.123+08:00" -> bdShNs,
    "Jul 13, 2009 09:07:13.123+0800" -> bdShNs,
    "Jul 13, 2009 09:07:13+08:00" -> bdShSec,
    "Jul 13, 2009 09:07:13+0800" -> bdShSec,
    "Jul 13, 2009 09:07:13.123Z" -> bdUtcNs,
    "Jul 13, 2009 09:07:13Z" -> bdUtcSec,
    "Jul 13, 2009 09:07:13.123" -> bdLocalNs(tz),
    "Jul 13, 2009 09:07:13" -> bdLocalSec(tz),
    "13/Jul/2009 09:07:13.123 +08:00" -> bdShNs,
    "13/Jul/2009 09:07:13.123 +0800" -> bdShNs,
    "13/Jul/2009 09:07:13 +08:00" -> bdShSec,
    "13/Jul/2009 09:07:13 +0800" -> bdShSec,
    "13/Jul/2009 09:07:13.123 Z" -> bdUtcNs,
    "13/Jul/2009 09:07:13 Z" -> bdUtcSec,
    "13/Jul/2009 09:07:13.123" -> bdLocalNs(tz),
    "13/Jul/2009 09:07:13" -> bdLocalSec(tz),
    // Date
    "2009-07-13" -> bdLocalDate(tz),
    "13/07/2009" -> bdLocalDate(tz),
    "13/Jul/2009" -> bdLocalDate(tz),
    "Jul 13, 2009" -> bdLocalDate(tz),
    "Mon Jul 13, 2009" -> bdLocalDate(tz))

  for (tz <- zones) test(s"layout matrix in $tz") {
    val zone = ZoneId.of(tz)
    for ((input, expected) <- cases(tz)) {
      val got = GoTimeLayouts.detect(input, zone).map(_._1)
      if (input.contains("CST")) {
        // ambiguous abbreviation: reference only logs mismatches
        if (got != Some(expected))
          info(s"CST-ambiguous: detect($input) = $got, expected $expected")
      } else {
        assert(got === Some(expected), s"detect($input) in $tz")
      }
    }
  }

  test("UnixFloat clamps to [0, 2^32) seconds (parser/parser.go:199-207)") {
    assert(GoTimeLayouts.unixFloat(-1.0, 1.0) === 0L)
    assert(GoTimeLayouts.unixFloat(4294967296.0, 1.0) === 0L)
    assert(GoTimeLayouts.unixFloat(4294967295.0, 1.0) === 4294967295000000L)
    assert(GoTimeLayouts.unixFloat(Double.PositiveInfinity, 1.0) === 0L)
    assert(GoTimeLayouts.unixFloat(Double.NegativeInfinity, 1.0) === 0L)
    assert(GoTimeLayouts.unixFloat(Double.NaN, 1.0) === 0L)
    // 123 * 1e-6 rounds fractionally below 123µs in IEEE754; Go's
    // int64(frac*1e9) truncates identically → 122µs on both sides.
    assert(GoTimeLayouts.unixFloat(123.0, 0.000001) === 122L)
    assert(GoTimeLayouts.unixFloat(1.5, 1.0) === 1500000L)
    // timeUnit scaling: ms-encoded input
    assert(GoTimeLayouts.unixFloat(1247476033123.0, 0.001) === 1247476033123000L)
  }

  test("detection order: first matching layout wins") {
    val utc = ZoneId.of("UTC")
    // "2009-07-13" could match layout 22 (2006-01-02) only; "13/07/2009"
    // matches 02/01/2006 (day first) — not 01/02/2006 (there is none).
    assert(GoTimeLayouts.detect("2009-07-13", utc).map(_._2) === Some(22))
    assert(GoTimeLayouts.detect("13/07/2009", utc).map(_._2) === Some(23))
  }
}
