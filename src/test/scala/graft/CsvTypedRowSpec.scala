package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.CType._
import graft.sources.{GoFloat, Rfc4180}
import graft.functions.GoTimeLayouts

/** Port of the reference's CSV getter semantics (parser/csv.go:41-230,
  * parser_test.go csv cases) against [[graft.sources.CsvTypedRow]].
  * The literal `"null"` cell means missing; there is no type info, so
  * numeric-looking strings DO parse (the reference skips those cases in
  * its cross-parser matrix and we assert the CSV-specific values).
  */
class CsvTypedRowSpec extends AnyFunSuite {
  import ParserFixtures._

  private val uf = (v: Double) => GoTimeLayouts.unixFloat(v, timeUnit)
  private val Epoch = 0L

  test("GetInt") {
    val cases = Seq(
      "not_exist" -> 0L, "null" -> 0L, "bool_true" -> 1L, "bool_false" -> 0L,
      "num_int" -> 123L, "num_float" -> 0L, "str" -> 0L,
      // CSV has no type info: numeric strings parse (csv.go:96-113)
      "str_int" -> 123L, "str_date_1" -> 0L, "obj" -> 0L, "array_empty" -> 0L)
    for ((f, exp) <- cases)
      assert(getCsv(f, CInt, nullable = false) === exp, s"csv.GetInt($f)")
    assert(getCsv("null", CInt, nullable = true) === null)
    assert(getCsv("num_int", CInt, nullable = true) === 123L)
  }

  test("GetFloat") {
    val cases = Seq(
      "not_exist" -> 0.0, "null" -> 0.0, "bool_true" -> 0.0, "bool_false" -> 0.0,
      "num_int" -> 123.0, "num_float" -> 123.321, "str" -> 0.0,
      "str_float" -> 123.321, "obj" -> 0.0)
    for ((f, exp) <- cases)
      assert(getCsv(f, CFloat, nullable = false) === exp, s"csv.GetFloat($f)")
    assert(getCsv("null", CFloat, nullable = true) === null)
  }

  test("GetString") {
    val cases = Seq(
      "not_exist" -> "", "null" -> "", "bool_true" -> "true",
      "bool_false" -> "false", "num_int" -> "123", "num_float" -> "123.321",
      "str" -> "escaped_\"ws", "str_date_1" -> "2009-07-13",
      "obj" -> """{"i":[1,2,3],"f":[1.1,2.2,3.3],"s":["aa","bb","cc"],"e":[]}""",
      "array_empty" -> "[]", "array_null" -> "[null]",
      "array_bool" -> "[true,false]")
    for ((f, exp) <- cases)
      assert(str(getCsv(f, CString, nullable = false)) === exp, s"csv.GetString($f)")
    assert(getCsv("null", CString, nullable = true) === null)
  }

  test("GetDateTime: float-first then layout chain (csv.go:115-135)") {
    assert(getCsv("num_int", CDateTime, nullable = false) === uf(123))
    assert(getCsv("num_float", CDateTime, nullable = false) === uf(123.321))
    assert(getCsv("str_int", CDateTime, nullable = false) === uf(123))
    assert(getCsv("str_date_1", CDateTime, nullable = false) === bdLocalDate("UTC"))
    assert(getCsv("str_time_rfc3339_1", CDateTime, nullable = false) === bdUtcSec)
    assert(getCsv("str_time_rfc3339_2", CDateTime, nullable = false) === bdShNs)
    assert(getCsv("str_time_clickhouse_1", CDateTime, nullable = false) === bdLocalSec("UTC"))
    // parse failure → Epoch even though present
    assert(getCsv("str", CDateTime, nullable = false) === Epoch)
    assert(getCsv("null", CDateTime, nullable = true) === null)
  }

  test("GetArray: embedded JSON cells (csv.go:146-226)") {
    assert(longs(getCsv("array_empty", CIntArray, nullable = false)) === Seq.empty)
    assert(longs(getCsv("array_null", CIntArray, nullable = false)) === Seq(0L))
    assert(longs(getCsv("array_bool", CIntArray, nullable = false)) === Seq(1L, 0L))
    assert(longs(getCsv("array_num_int_1", CIntArray, nullable = false)) ===
      Seq(0L, 255L, 256L, 65535L, 65536L, 4294967295L, 4294967296L, 0L, 0L))
    assert(longs(getCsv("array_num_int_2", CIntArray, nullable = false)) ===
      Seq(-9223372036854775808L, -2147483649L, -2147483648L, -32769L, -32768L,
        -129L, -128L, 0L, 127L, 128L, 32767L, 32768L, 2147483647L, 2147483648L,
        9223372036854775807L))
    assert(strings(getCsv("array_str", CStringArray, nullable = false)) ===
      Seq("aa", "bb", "cc"))
    assert(strings(getCsv("array_obj", CStringArray, nullable = false)) ===
      Seq("""{"i":[1,2,3],"f":[1.1,2.2,3.3]}""", """{"s":["aa","bb","cc"],"e":[]}"""))
    assert(longs(getCsv("array_str_date_1", CDateTimeArray, nullable = false)) ===
      Seq(bdLocalDate("UTC"), bdLocalDate("UTC") + 86400000000L,
        bdLocalDate("UTC") + 2 * 86400000000L))
    // non-array / scalar cells → empty
    assert(longs(getCsv("num_int", CIntArray, nullable = false)) === Seq.empty)
    assert(strings(getCsv("str", CStringArray, nullable = false)) === Seq.empty)
  }

  test("field-count mismatch is a parse error (csv.Reader.FieldsPerRecord)") {
    val specs = Seq(spec("a", CInt, nullable = false))
    assert(evalCsv("1,2", specs, fmt = Seq("a", "b", "c")) === null)
    assert(evalCsv("1,2,3,4", specs, fmt = Seq("a", "b", "c")) === null)
    assert(evalCsv("1,2,3", specs, fmt = Seq("a", "b", "c")) !== null)
  }

  test("malformed quoting is a parse error") {
    assert(evalCsv("\"unterminated", Seq(spec("a", CString, nullable = false)),
      fmt = Seq("a")) === null)
    assert(Rfc4180.split("a\"b", ',') === None)
    assert(Rfc4180.split("\"a\"b", ',') === None)
    assert(Rfc4180.split("\"a\"\"b\"", ',').get.toSeq === Seq("a\"b"))
  }

  test("custom delimiter") {
    val row = evalCsv("1|x|2.5", Seq(
      spec("a", CInt, nullable = false), spec("b", CString, nullable = false),
      spec("c", CFloat, nullable = false)),
      fmt = Seq("a", "b", "c"), delim = "|")
    assert(row.getLong(0) === 1L)
    assert(row.getUTF8String(1).toString === "x")
    assert(row.getDouble(2) === 2.5)
  }

  test("GoFloat.strict: strconv.ParseFloat grammar") {
    assert(GoFloat.strict("1.5") === Some(1.5))
    assert(GoFloat.strict("-1e3") === Some(-1000.0))
    assert(GoFloat.strict(".5") === Some(0.5))
    assert(GoFloat.strict("5.") === Some(5.0))
    assert(GoFloat.strict("inf") === Some(Double.PositiveInfinity))
    assert(GoFloat.strict("-Infinity") === Some(Double.NegativeInfinity))
    assert(GoFloat.strict("nan").exists(_.isNaN))
    // Java-isms Go rejects:
    assert(GoFloat.strict(" 1.5") === None)
    assert(GoFloat.strict("1.5 ") === None)
    assert(GoFloat.strict("1.5f") === None)
    assert(GoFloat.strict("1.5d") === None)
    assert(GoFloat.strict("0x1p-2") === None) // hex floats unsupported, documented
    assert(GoFloat.strict("") === None)
  }
}
