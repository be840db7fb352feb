package graft

import java.time.{ZonedDateTime, ZoneId, ZoneOffset}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.schema.{ColumnSpec, CType}
import graft.sources.{CsvTypedRow, JsonTypedRow}

/** Golden inputs transcribed from the reference's parser tests
  * (parser/parser_test.go:38-137, documented in FIXTURES.md §1): one JSON
  * object exercising every type edge case and its positional CSV twin.
  */
object ParserFixtures {

  val jsonSample: String = """{
	"null": null,
	"bool_true": true,
	"bool_false": false,
	"num_int": 123,
	"num_float": 123.321,
	"str": "escaped_\"ws",
	"str_int": "123",
	"str_float": "123.321",
	"str_date_1": "2009-07-13",
	"str_date_2": "13/07/2009",
	"str_time_rfc3339_1": "2009-07-13T09:07:13Z",
	"str_time_rfc3339_2": "2009-07-13T09:07:13.123+08:00",
	"str_time_clickhouse_1": "2009-07-13 09:07:13",
	"str_time_clickhouse_2": "2009-07-13 09:07:13.123",
	"obj": {"i":[1,2,3],"f":[1.1,2.2,3.3],"s":["aa","bb","cc"],"e":[]},
	"array_empty": [],
	"array_null": [null],
	"array_bool": [true,false],
	"array_num_int_1": [0, 255, 256, 65535, 65536, 4294967295, 4294967296, 18446744073709551615, 18446744073709551616],
	"array_num_int_2": [-9223372036854775808, -2147483649, -2147483648, -32769, -32768, -129, -128, 0, 127, 128, 32767, 32768, 2147483647, 2147483648, 9223372036854775807],
	"array_num_float": [4.940656458412465441765687928682213723651e-324, 1.401298464324817070923729583289916131280e-45, 0.0, 3.40282346638528859811704183484516925440e+38, 1.797693134862315708145274237317043567981e+308, -inf, +inf],
	"array_str": ["aa","bb","cc"],
	"array_str_int_1": ["0", "255", "256", "65535", "65536", "4294967295", "4294967296", "18446744073709551615", "18446744073709551616"],
	"array_str_int_2": ["-9223372036854775808", "-2147483649", "-2147483648", "-32769", "-32768", "-129", "-128", "0", "127", "128", "32767", "32768", "2147483647", "2147483648", "9223372036854775807"],
	"array_str_float": ["4.940656458412465441765687928682213723651e-324", "1.401298464324817070923729583289916131280e-45", "0.0", "3.40282346638528859811704183484516925440e+38", "1.797693134862315708145274237317043567981e+308", "-inf", "+inf"],
	"array_str_date_1": ["2009-07-13","2009-07-14","2009-07-15"],
	"array_str_date_2": ["13/07/2009","14/07/2009","15/07/2009"],
	"array_str_time_rfc3339": ["2009-07-13T09:07:13Z", "2009-07-13T09:07:13+08:00", "2009-07-13T09:07:13.123Z", "2009-07-13T09:07:13.123+08:00"],
	"array_str_time_clickhouse": ["2009-07-13 09:07:13", "2009-07-13 09:07:13.123"],
	"array_obj": [{"i":[1,2,3],"f":[1.1,2.2,3.3]},{"s":["aa","bb","cc"],"e":[]}]
}"""

  val csvSample: String = """null,true,false,123,123.321,"escaped_""ws",123,123.321,2009-07-13,13/07/2009,2009-07-13T09:07:13Z,2009-07-13T09:07:13.123+08:00,2009-07-13 09:07:13,2009-07-13 09:07:13.123,"{""i"":[1,2,3],""f"":[1.1,2.2,3.3],""s"":[""aa"",""bb"",""cc""],""e"":[]}",[],[null],"[true,false]","[0,255,256,65535,65536,4294967295,4294967296,18446744073709551615,18446744073709551616]","[-9223372036854775808,-2147483649,-2147483648,-32769,-32768,-129,-128,0,127,128,32767,32768,2147483647,2147483648,9223372036854775807]","[4.940656458412465441765687928682213723651e-324,1.401298464324817070923729583289916131280e-45,0.0,3.40282346638528859811704183484516925440e+38,1.797693134862315708145274237317043567981e+308]","[""aa"",""bb"",""cc""]","[""0"",""255"",""256"",""65535"",""65536"",""4294967295"",""4294967296"",""18446744073709551615"",""18446744073709551616""]","[""-9223372036854775808"",""-2147483649"",""-2147483648"",""-32769"",""-32768"",""-129"",""-128"",""0"",""127"",""128"",""32767"",""32768"",""2147483647"",""2147483648"",""9223372036854775807""]","[""4.940656458412465441765687928682213723651e-324"",""1.401298464324817070923729583289916131280e-45"",""0.0"",""3.40282346638528859811704183484516925440e+38"",""1.797693134862315708145274237317043567981e+308""]","[""2009-07-13"",""2009-07-14"",""2009-07-15""]","[""13/07/2009"",""14/07/2009"",""15/07/2009""]","[""2009-07-13T09:07:13Z"",""2009-07-13T09:07:13+08:00"",""2009-07-13T09:07:13.123Z"",""2009-07-13T09:07:13.123+08:00""]","[""2009-07-13 09:07:13"",""2009-07-13 09:07:13.123""]","[{""i"":[1,2,3],""f"":[1.1,2.2,3.3]},{""s"":[""aa"",""bb"",""cc""],""e"":[]}]""" + "\""

  val csvSchema: Seq[String] = Seq(
    "null", "bool_true", "bool_false", "num_int", "num_float", "str",
    "str_int", "str_float", "str_date_1", "str_date_2",
    "str_time_rfc3339_1", "str_time_rfc3339_2",
    "str_time_clickhouse_1", "str_time_clickhouse_2", "obj",
    "array_empty", "array_null", "array_bool",
    "array_num_int_1", "array_num_int_2", "array_num_float",
    "array_str", "array_str_int_1", "array_str_int_2", "array_str_float",
    "array_str_date_1", "array_str_date_2",
    "array_str_time_rfc3339", "array_str_time_clickhouse", "array_obj")

  /** Expected detected type per sample field (parser_test.go:71-102);
    * None ≡ the reference's Unknown. */
  val jsonSchema: Map[String, Option[CType]] = Map(
    "null" -> None,
    "bool_true" -> Some(CType.CInt), "bool_false" -> Some(CType.CInt),
    "num_int" -> Some(CType.CInt), "num_float" -> Some(CType.CFloat),
    "str" -> Some(CType.CString), "str_int" -> Some(CType.CString),
    "str_float" -> Some(CType.CString),
    "str_date_1" -> Some(CType.CDateTime), "str_date_2" -> Some(CType.CDateTime),
    "str_time_rfc3339_1" -> Some(CType.CDateTime),
    "str_time_rfc3339_2" -> Some(CType.CDateTime),
    "str_time_clickhouse_1" -> Some(CType.CDateTime),
    "str_time_clickhouse_2" -> Some(CType.CDateTime),
    "obj" -> Some(CType.CString),
    "array_empty" -> None, "array_null" -> None,
    "array_bool" -> Some(CType.CIntArray),
    "array_num_int_1" -> Some(CType.CIntArray),
    "array_num_int_2" -> Some(CType.CIntArray),
    "array_num_float" -> Some(CType.CFloatArray),
    "array_str" -> Some(CType.CStringArray),
    "array_str_int_1" -> Some(CType.CStringArray),
    "array_str_int_2" -> Some(CType.CStringArray),
    "array_str_float" -> Some(CType.CStringArray),
    "array_str_date_1" -> Some(CType.CDateTimeArray),
    "array_str_date_2" -> Some(CType.CDateTimeArray),
    "array_str_time_rfc3339" -> Some(CType.CDateTimeArray),
    "array_str_time_clickhouse" -> Some(CType.CDateTimeArray),
    "array_obj" -> Some(CType.CStringArray))

  /** timeUnit used by the reference sample tests (parser_test.go:150). */
  val timeUnit: Double = 0.000001

  def usOf(z: ZonedDateTime): Long = {
    val i = z.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  // The reference's expected instants (parser_test.go:139-149), epoch µs.
  val bdUtcNs: Long = usOf(ZonedDateTime.of(2009, 7, 13, 9, 7, 13, 123000000, ZoneOffset.UTC))
  val bdUtcSec: Long = usOf(ZonedDateTime.of(2009, 7, 13, 9, 7, 13, 0, ZoneOffset.UTC))
  val bdShNs: Long = usOf(ZonedDateTime.of(2009, 7, 13, 9, 7, 13, 123000000, ZoneOffset.ofHours(8)))
  val bdShSec: Long = usOf(ZonedDateTime.of(2009, 7, 13, 9, 7, 13, 0, ZoneOffset.ofHours(8)))
  val bdShMin: Long = usOf(ZonedDateTime.of(2009, 7, 13, 9, 7, 0, 0, ZoneOffset.ofHours(8)))
  def bdLocalNs(tz: String): Long =
    usOf(ZonedDateTime.of(2009, 7, 13, 9, 7, 13, 123000000, ZoneId.of(tz)))
  def bdLocalSec(tz: String): Long =
    usOf(ZonedDateTime.of(2009, 7, 13, 9, 7, 13, 0, ZoneId.of(tz)))
  def bdLocalDate(tz: String): Long =
    usOf(ZonedDateTime.of(2009, 7, 13, 0, 0, 0, 0, ZoneId.of(tz)))

  // ---- direct-eval helpers (no SparkSession needed) ----

  def evalJson(json: String, specs: Seq[ColumnSpec],
      tu: Double = timeUnit, tz: String = "UTC"): InternalRow =
    JsonTypedRow(Literal(UTF8String.fromString(json), StringType), specs, tu, tz)
      .eval(InternalRow.empty).asInstanceOf[InternalRow]

  def evalCsv(line: String, specs: Seq[ColumnSpec], fmt: Seq[String] = csvSchema,
      delim: String = ",", tu: Double = timeUnit, tz: String = "UTC"): InternalRow =
    CsvTypedRow(Literal(UTF8String.fromString(line), StringType), specs, fmt,
      delim, tu, tz)
      .eval(InternalRow.empty).asInstanceOf[InternalRow]

  def spec(field: String, t: CType, nullable: Boolean): ColumnSpec =
    ColumnSpec(field, t, nullable, field)

  /** One-field extraction from the sample — mirrors `metric.GetX(field,
    * nullable)`. Values come back as Long/Double/UTF8String/ArrayData. */
  def getJson(field: String, t: CType, nullable: Boolean,
      tz: String = "UTC"): Any =
    evalJson(jsonSample, Seq(spec(field, t, nullable)), timeUnit, tz).get(0, t.sparkType)

  def getCsv(field: String, t: CType, nullable: Boolean,
      tz: String = "UTC"): Any =
    evalCsv(csvSample, Seq(spec(field, t, nullable)), csvSchema, ",", timeUnit, tz)
      .get(0, t.sparkType)

  def longs(a: Any): Seq[Long] = a.asInstanceOf[ArrayData].toLongArray().toSeq
  def doubles(a: Any): Seq[Double] = a.asInstanceOf[ArrayData].toDoubleArray().toSeq
  def strings(a: Any): Seq[String] =
    a.asInstanceOf[ArrayData].toObjectArray(StringType).toSeq.map(_.toString)
  def str(a: Any): String = a.asInstanceOf[UTF8String].toString
}
