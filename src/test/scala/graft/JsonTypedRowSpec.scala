package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.CType
import graft.schema.CType._
import graft.sources.{DetectType, JsonParser, JValue}
import graft.functions.GoTimeLayouts

/** Port of the reference's fastjson getter matrix
  * (parser/parser_test.go:249-520) against [[graft.sources.JsonTypedRow]].
  */
class JsonTypedRowSpec extends AnyFunSuite {
  import ParserFixtures._

  private val uf = (v: Double) => GoTimeLayouts.unixFloat(v, timeUnit)
  private val Epoch = 0L

  // ---- GetInt (parser_test.go:249-279) ----
  test("GetInt non-nullable") {
    val cases = Seq(
      "not_exist" -> 0L, "null" -> 0L, "bool_true" -> 1L, "bool_false" -> 0L,
      "num_int" -> 123L, "num_float" -> 0L, "str" -> 0L, "str_int" -> 0L,
      "str_float" -> 0L, "str_date_1" -> 0L, "obj" -> 0L, "array_empty" -> 0L)
    for ((f, exp) <- cases)
      assert(getJson(f, CInt, nullable = false) === exp, s"GetInt($f, false)")
  }

  test("GetInt nullable") {
    val cases = Seq(
      "not_exist" -> null, "null" -> null, "bool_true" -> 1L, "bool_false" -> 0L,
      "num_int" -> 123L, "num_float" -> null, "str" -> null, "str_int" -> null,
      "str_float" -> null, "str_date_1" -> null, "obj" -> null,
      "array_empty" -> null)
    for ((f, exp) <- cases)
      assert(getJson(f, CInt, nullable = true) === exp, s"GetInt($f, true)")
  }

  // ---- GetFloat (parser_test.go:281-311): bools NOT accepted ----
  test("GetFloat non-nullable") {
    val cases = Seq(
      "not_exist" -> 0.0, "null" -> 0.0, "bool_true" -> 0.0, "bool_false" -> 0.0,
      "num_int" -> 123.0, "num_float" -> 123.321, "str" -> 0.0, "str_int" -> 0.0,
      "str_float" -> 0.0, "str_date_1" -> 0.0, "obj" -> 0.0, "array_empty" -> 0.0)
    for ((f, exp) <- cases)
      assert(getJson(f, CFloat, nullable = false) === exp, s"GetFloat($f, false)")
  }

  test("GetFloat nullable") {
    val cases = Seq(
      "not_exist" -> null, "null" -> null, "bool_true" -> null,
      "bool_false" -> null, "num_int" -> 123.0, "num_float" -> 123.321,
      "str" -> null, "str_date_1" -> null, "obj" -> null, "array_empty" -> null)
    for ((f, exp) <- cases)
      assert(getJson(f, CFloat, nullable = true) === exp, s"GetFloat($f, true)")
  }

  // ---- GetString (parser_test.go:313-349): non-strings render compact ----
  test("GetString") {
    val cases = Seq(
      "not_exist" -> "", "null" -> "", "bool_true" -> "true",
      "bool_false" -> "false", "num_int" -> "123", "num_float" -> "123.321",
      "str" -> "escaped_\"ws", "str_int" -> "123", "str_float" -> "123.321",
      "str_date_1" -> "2009-07-13",
      "obj" -> """{"i":[1,2,3],"f":[1.1,2.2,3.3],"s":["aa","bb","cc"],"e":[]}""",
      "array_empty" -> "[]", "array_null" -> "[null]",
      "array_bool" -> "[true,false]", "array_str" -> """["aa","bb","cc"]""")
    for ((f, exp) <- cases)
      assert(str(getJson(f, CString, nullable = false)) === exp, s"GetString($f)")
    assert(getJson("not_exist", CString, nullable = true) === null)
    assert(getJson("null", CString, nullable = true) === null)
    assert(str(getJson("str", CString, nullable = true)) === "escaped_\"ws")
  }

  // ---- GetDateTime (parser_test.go:351-389), tz=UTC so Local ≡ UTC ----
  test("GetDateTime") {
    val cases = Seq(
      "not_exist" -> Epoch, "null" -> Epoch, "bool_true" -> Epoch,
      "bool_false" -> Epoch, "num_int" -> uf(123), "num_float" -> uf(123.321),
      "str" -> Epoch, "str_int" -> Epoch, "str_float" -> Epoch,
      "str_date_1" -> bdLocalDate("UTC"),
      "str_time_rfc3339_1" -> bdUtcSec, "str_time_rfc3339_2" -> bdShNs,
      "str_time_clickhouse_1" -> bdLocalSec("UTC"),
      "str_time_clickhouse_2" -> bdLocalNs("UTC"),
      "obj" -> Epoch, "array_empty" -> Epoch)
    for ((f, exp) <- cases)
      assert(getJson(f, CDateTime, nullable = false) === exp, s"GetDateTime($f)")
    assert(getJson("not_exist", CDateTime, nullable = true) === null)
    assert(getJson("str", CDateTime, nullable = true) === null)
    assert(getJson("num_int", CDateTime, nullable = true) === uf(123))
    assert(getJson("str_time_rfc3339_2", CDateTime, nullable = true) === bdShNs)
  }

  // ---- GetElasticDateTime (parser_test.go:391-429): epoch seconds ----
  test("GetElasticDateTime") {
    assert(getJson("not_exist", CElasticDateTime, nullable = false) === 0L)
    assert(getJson("num_int", CElasticDateTime, nullable = false) ===
      Math.floorDiv(uf(123), 1000000L))
    assert(getJson("str_time_rfc3339_1", CElasticDateTime, nullable = false) ===
      bdUtcSec / 1000000L)
    assert(getJson("str_time_rfc3339_2", CElasticDateTime, nullable = false) ===
      Math.floorDiv(bdShNs, 1000000L))
    assert(getJson("not_exist", CElasticDateTime, nullable = true) === null)
    assert(getJson("str", CElasticDateTime, nullable = true) === null)
  }

  // ---- GetArray (parser_test.go:431-520) ----
  test("GetArray of Int") {
    assert(longs(getJson("not_exist", CIntArray, nullable = false)) === Seq.empty)
    assert(longs(getJson("num_int", CIntArray, nullable = false)) === Seq.empty)
    assert(longs(getJson("array_empty", CIntArray, nullable = false)) === Seq.empty)
    assert(longs(getJson("array_null", CIntArray, nullable = false)) === Seq(0L))
    assert(longs(getJson("array_bool", CIntArray, nullable = false)) === Seq(1L, 0L))
    // u64-overflow elements → 0 (strict int64 token re-parse)
    assert(longs(getJson("array_num_int_1", CIntArray, nullable = false)) ===
      Seq(0L, 255L, 256L, 65535L, 65536L, 4294967295L, 4294967296L, 0L, 0L))
    assert(longs(getJson("array_num_int_2", CIntArray, nullable = false)) ===
      Seq(-9223372036854775808L, -2147483649L, -2147483648L, -32769L, -32768L,
        -129L, -128L, 0L, 127L, 128L, 32767L, 32768L, 2147483647L, 2147483648L,
        9223372036854775807L))
    assert(longs(getJson("array_num_float", CIntArray, nullable = false)) ===
      Seq.fill(7)(0L))
    assert(longs(getJson("array_str", CIntArray, nullable = false)) === Seq(0L, 0L, 0L))
    assert(longs(getJson("array_str_int_1", CIntArray, nullable = false)) ===
      Seq.fill(9)(0L))
  }

  test("GetArray of Float") {
    assert(doubles(getJson("array_null", CFloatArray, nullable = false)) === Seq(0.0))
    assert(doubles(getJson("array_bool", CFloatArray, nullable = false)) === Seq(0.0, 0.0))
    assert(doubles(getJson("array_num_int_1", CFloatArray, nullable = false)) ===
      Seq(0.0, 255.0, 256.0, 65535.0, 65536.0, 4294967295.0, 4294967296.0,
        18446744073709551615.0, 18446744073709551616.0))
    val floats = doubles(getJson("array_num_float", CFloatArray, nullable = false))
    assert(floats(0) === 4.940656458412465441765687928682213723651e-324)
    assert(floats(1) === 1.401298464324817070923729583289916131280e-45)
    assert(floats(2) === 0.0)
    assert(floats(3) === 3.40282346638528859811704183484516925440e+38)
    assert(floats(4) === 1.797693134862315708145274237317043567981e+308)
    assert(floats(5).isNegInfinity && floats(6).isPosInfinity)
    assert(doubles(getJson("array_str_float", CFloatArray, nullable = false)) ===
      Seq.fill(7)(0.0))
  }

  test("GetArray of String") {
    assert(strings(getJson("array_null", CStringArray, nullable = false)) === Seq(""))
    assert(strings(getJson("array_bool", CStringArray, nullable = false)) ===
      Seq("true", "false"))
    // numbers keep their raw token text, incl. -inf/+inf
    assert(strings(getJson("array_num_int_1", CStringArray, nullable = false)) ===
      Seq("0", "255", "256", "65535", "65536", "4294967295", "4294967296",
        "18446744073709551615", "18446744073709551616"))
    assert(strings(getJson("array_num_float", CStringArray, nullable = false)) ===
      Seq("4.940656458412465441765687928682213723651e-324",
        "1.401298464324817070923729583289916131280e-45", "0.0",
        "3.40282346638528859811704183484516925440e+38",
        "1.797693134862315708145274237317043567981e+308", "-inf", "+inf"))
    assert(strings(getJson("array_str", CStringArray, nullable = false)) ===
      Seq("aa", "bb", "cc"))
    assert(strings(getJson("array_obj", CStringArray, nullable = false)) ===
      Seq("""{"i":[1,2,3],"f":[1.1,2.2,3.3]}""", """{"s":["aa","bb","cc"],"e":[]}"""))
  }

  test("GetArray of DateTime") {
    assert(longs(getJson("array_null", CDateTimeArray, nullable = false)) === Seq(Epoch))
    assert(longs(getJson("array_num_int_1", CDateTimeArray, nullable = false)) ===
      Seq(Epoch, uf(255), uf(256), uf(65535), uf(65536), uf(4294967295.0),
        uf(4294967296.0), Epoch, Epoch))
    assert(longs(getJson("array_num_float", CDateTimeArray, nullable = false)) ===
      Seq(Epoch, Epoch, Epoch, Epoch, Epoch, Epoch, Epoch))
    assert(longs(getJson("array_str_date_1", CDateTimeArray, nullable = false)) ===
      Seq(bdLocalDate("UTC"), bdLocalDate("UTC") + 86400000000L,
        bdLocalDate("UTC") + 2 * 86400000000L))
    assert(longs(getJson("array_str_time_rfc3339", CDateTimeArray, nullable = false)) ===
      Seq(bdUtcSec, bdShSec, bdUtcNs, bdShNs))
    assert(longs(getJson("array_str_time_clickhouse", CDateTimeArray, nullable = false)) ===
      Seq(bdLocalSec("UTC"), bdLocalNs("UTC")))
  }

  // ---- parse errors & roots (fastjson Parse/Get semantics) ----
  test("malformed JSON → null row (dropped)") {
    assert(evalJson("{not json", Seq(spec("a", CInt, nullable = false))) === null)
    assert(evalJson("", Seq(spec("a", CInt, nullable = false))) === null)
    assert(evalJson("""{"a": 1,}""", Seq(spec("a", CInt, nullable = false))) === null)
  }

  test("non-object root → all-defaults row (reference Value.Get misses)") {
    val row = evalJson("123", Seq(
      spec("a", CInt, nullable = false), spec("b", CString, nullable = false),
      spec("c", CFloat, nullable = true)))
    assert(row.getLong(0) === 0L)
    assert(row.getUTF8String(1).toString === "")
    assert(row.isNullAt(2))
  }

  test("bare inf/nan number tokens (fastjson extension, parser_test.go:60)") {
    val row = evalJson("""{"f": inf, "g": -inf, "h": nan}""", Seq(
      spec("f", CFloat, nullable = false), spec("g", CFloat, nullable = false),
      spec("h", CFloat, nullable = false)))
    assert(row.getDouble(0).isPosInfinity)
    assert(row.getDouble(1).isNegInfinity)
    assert(row.getDouble(2).isNaN)
  }

  // ---- fjDetectType (parser_test.go:665-699) ----
  test("DetectType matches the reference's jsonSchema table") {
    val parsed = new JsonParser().parse(jsonSample).get.asInstanceOf[JValue.JObj]
    val utc = java.time.ZoneId.of("UTC")
    for ((field, expected) <- jsonSchema) {
      val v = parsed.get(field)
      assert(DetectType.detect(v, utc) === expected, s"fjDetectType($field)")
    }
  }

  test("layout memoization: first successful layout locks the field") {
    // Same expression instance parses two rows; the second value would
    // parse under layout 24 (02/01/2006) but the field was locked to
    // layout 23 (2006-01-02) — reference parser/parser.go:139-168.
    val specs = Seq(spec("d", CDateTime, nullable = true))
    val e = graft.sources.JsonTypedRow(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(""),
        org.apache.spark.sql.types.StringType),
      specs, timeUnit, "UTC")
    val r1 = e.nullSafeEval(
      org.apache.spark.unsafe.types.UTF8String.fromString("""{"d":"2009-07-13"}"""))
    val r2 = e.nullSafeEval(
      org.apache.spark.unsafe.types.UTF8String.fromString("""{"d":"13/07/2009"}"""))
    assert(r1.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getLong(0) ===
      bdLocalDate("UTC"))
    // locked layout fails on the second shape → default (null here)
    assert(r2.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].isNullAt(0))
  }
}
