package graft.sources

import java.time.ZoneId

import scala.collection.mutable

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.schema.{ColumnSpec, CType}
import graft.functions.GoTimeLayouts

/** Shared coercion core for the JSON / CSV message parsers.
  *
  * Reproduces the reference's per-field typed extraction exactly
  * (parser/fastjson.go:54-211, parser/csv.go:67-226, FIXTURES.md §1):
  * missing or type-incompatible values become typed defaults
  * (`0`, `0.0`, `""`, Epoch, `[]`) when the column is non-nullable and
  * NULL when nullable; bool → 1/0 for Int; numeric datetimes go through
  * `UnixFloat(v * timeUnit)`; string datetimes through the multi-layout
  * chain with per-field layout memoization; int64 overflow / non-integral
  * numbers default for Int columns. Spark's own `from_json` can't express
  * these (it nulls on mismatch), hence a custom expression — same plan
  * position as `from_json` (one parse per record, CodegenFallback, column
  * pruning above it still reaches the scan).
  */
abstract class TypedRowParserExpr extends UnaryExpression with CodegenFallback {

  def specs: Seq[ColumnSpec]
  def timeUnit: Double
  def timeZone: String

  @transient protected lazy val zone: ZoneId = ZoneId.of(timeZone)
  /** field → first successfully detected layout (parser/parser.go:139-168) */
  @transient protected lazy val knownLayouts: mutable.HashMap[String, Int] =
    mutable.HashMap.empty

  override def dataType: DataType = StructType(specs.map(_.field))
  override def nullable: Boolean = true

  protected def parseDateTime(key: String, s: String): Option[Long] = {
    if (s.isEmpty) return None
    knownLayouts.get(key) match {
      case Some(idx) => GoTimeLayouts.parseWithLayout(idx, s, zone)
      case None =>
        GoTimeLayouts.detect(s, zone).map { case (us, idx) =>
          knownLayouts.update(key, idx)
          us
        }
    }
  }
}

object TypedRowParserExpr {
  /** Jackson with exact-number nodes so raw-token semantics match
    * fastjson: ints of any width stay integral (overflow detectable),
    * floats keep their textual scale. */
  private[sources] def newMapper(): ObjectMapper = {
    val m = new ObjectMapper()
    m.enable(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS)
    m.enable(DeserializationFeature.USE_BIG_INTEGER_FOR_INTS)
    m
  }
}

/** JSON message → typed row (the `MetricToRow` projection core,
  * model/message.go:171-212 over parser/fastjson.go getters).
  * Returns null on malformed JSON — the parse-error filter drops it
  * (task/task.go:280-287).
  */
case class JsonTypedRow(
    child: Expression,
    specs: Seq[ColumnSpec],
    timeUnit: Double,
    timeZone: String) extends TypedRowParserExpr {

  @transient private lazy val mapper = TypedRowParserExpr.newMapper()

  override def nullSafeEval(input: Any): Any = {
    val root: JsonNode =
      try {
        val node = mapper.readTree(input.asInstanceOf[UTF8String].getBytes)
        if (node == null || !node.isObject) return null
        node
      } catch { case _: Exception => return null }
    val values = new Array[Any](specs.length)
    var i = 0
    while (i < specs.length) {
      val spec = specs(i)
      values(i) = extract(root.get(spec.sourceName), spec)
      i += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def extract(v: JsonNode, spec: ColumnSpec): Any = spec.ctype match {
    case CType.CInt => getInt(v, spec.nullable)
    case CType.CFloat => getFloat(v, spec.nullable)
    case CType.CString => getString(v, spec.nullable)
    case CType.CDateTime => getDateTime(v, spec)
    case CType.CElasticDateTime => getDateTime(v, spec) match {
      case null => null
      case us: java.lang.Long => java.lang.Long.valueOf(Math.floorDiv(us, 1000000L))
    }
    case arr => getArray(v, CType.elementOf(arr), spec)
  }

  private def isMissing(v: JsonNode): Boolean =
    v == null || v.getNodeType == JsonNodeType.NULL

  /** fastjson GetInt: bool → 1/0; integral in-int64-range numbers pass;
    * everything else (strings, floats, overflow) → default. */
  private def getInt(v: JsonNode, nullable: Boolean): Any = {
    if (isMissing(v)) return if (nullable) null else java.lang.Long.valueOf(0L)
    v.getNodeType match {
      case JsonNodeType.BOOLEAN => java.lang.Long.valueOf(if (v.booleanValue) 1L else 0L)
      case JsonNodeType.NUMBER if v.isIntegralNumber && v.canConvertToLong =>
        java.lang.Long.valueOf(v.longValue)
      case _ => if (nullable) null else java.lang.Long.valueOf(0L)
    }
  }

  /** fastjson GetFloat: numbers only (bools are NOT accepted). */
  private def getFloat(v: JsonNode, nullable: Boolean): Any = {
    if (isMissing(v)) return if (nullable) null else java.lang.Double.valueOf(0.0)
    v.getNodeType match {
      case JsonNodeType.NUMBER => java.lang.Double.valueOf(v.doubleValue)
      case _ => if (nullable) null else java.lang.Double.valueOf(0.0)
    }
  }

  /** fastjson GetString: strings verbatim; any other present value
    * renders as its compact JSON text (objects/arrays/numbers/bools). */
  private def getString(v: JsonNode, nullable: Boolean): Any = {
    if (isMissing(v)) return if (nullable) null else UTF8String.EMPTY_UTF8
    if (v.isTextual) UTF8String.fromString(v.textValue)
    else UTF8String.fromString(v.toString)
  }

  /** fastjson GetDateTime: number → UnixFloat(v*timeUnit); string →
    * layout chain; else default Epoch / null. Micros. */
  private def getDateTime(v: JsonNode, spec: ColumnSpec): Any = {
    def dflt: Any = if (spec.nullable) null
      else java.lang.Long.valueOf(GoTimeLayouts.EpochMicros)
    if (isMissing(v)) return dflt
    v.getNodeType match {
      case JsonNodeType.NUMBER =>
        java.lang.Long.valueOf(GoTimeLayouts.unixFloat(v.doubleValue, timeUnit))
      case JsonNodeType.STRING =>
        val s = v.textValue
        parseDateTime(spec.sourceName, s)
          .map(java.lang.Long.valueOf)
          .getOrElse(dflt)
      case _ => dflt
    }
  }

  /** fastjson GetArray: missing/non-array → empty; elements coerce
    * per-type with zero-defaults, never null. */
  private def getArray(v: JsonNode, el: CType, spec: ColumnSpec): ArrayData = {
    if (v == null || v.getNodeType != JsonNodeType.ARRAY)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](v.size)
    var i = 0
    while (i < v.size) {
      val e = v.get(i)
      out(i) = el match {
        case CType.CInt =>
          if (e.isBoolean && e.booleanValue) 1L
          else if (e.isIntegralNumber && e.canConvertToLong) e.longValue
          else 0L
        case CType.CFloat =>
          if (e.isNumber) e.doubleValue else 0.0
        case CType.CString =>
          if (e.isNull) UTF8String.EMPTY_UTF8
          else if (e.isTextual) UTF8String.fromString(e.textValue)
          else UTF8String.fromString(e.toString)
        case CType.CDateTime =>
          if (e.isNumber) GoTimeLayouts.unixFloat(e.doubleValue, timeUnit)
          else if (e.isTextual)
            parseDateTime(spec.sourceName, e.textValue)
              .getOrElse(GoTimeLayouts.EpochMicros)
          else GoTimeLayouts.EpochMicros
        case other => throw new IllegalStateException(s"array of $other")
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** CSV record → typed row (parser/csv.go). Schema is an ordered column
  * list; the literal `"null"` means null; array cells carry embedded JSON
  * (parser/csv.go:146-226).
  */
case class CsvTypedRow(
    child: Expression,
    specs: Seq[ColumnSpec],
    csvFormat: Seq[String],
    delimiter: String,
    timeUnit: Double,
    timeZone: String) extends TypedRowParserExpr {

  @transient private lazy val mapper = TypedRowParserExpr.newMapper()
  @transient private lazy val colIdx: Map[String, Int] = csvFormat.zipWithIndex.toMap
  private def delim: Char = if (delimiter.isEmpty) ',' else delimiter.charAt(0)

  override def nullSafeEval(input: Any): Any = {
    val line = input.asInstanceOf[UTF8String].toString
    val fields = Rfc4180.split(line, delim) match {
      case Some(f) => f
      case None => return null
    }
    val values = new Array[Any](specs.length)
    var i = 0
    while (i < specs.length) {
      val spec = specs(i)
      val cell: String = colIdx.get(spec.sourceName) match {
        case Some(idx) if idx < fields.length => fields(idx)
        case _ => null // unknown column ≡ missing
      }
      values(i) = extract(cell, spec)
      i += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def extract(cell: String, spec: ColumnSpec): Any = {
    val missing = cell == null || cell == "null"
    spec.ctype match {
      case CType.CInt =>
        if (missing) { if (spec.nullable) null else java.lang.Long.valueOf(0L) }
        else if (cell == "true") java.lang.Long.valueOf(1L)
        else java.lang.Long.valueOf(parseInt64BestEffort(cell))
      case CType.CFloat =>
        if (missing) { if (spec.nullable) null else java.lang.Double.valueOf(0.0) }
        else java.lang.Double.valueOf(parseFloatBestEffort(cell))
      case CType.CString =>
        if (missing) { if (spec.nullable) null else UTF8String.EMPTY_UTF8 }
        else UTF8String.fromString(cell)
      case CType.CDateTime =>
        if (missing) { if (spec.nullable) null else java.lang.Long.valueOf(0L) }
        else java.lang.Long.valueOf(parseCsvDateTime(cell, spec))
      case CType.CElasticDateTime =>
        if (missing) { if (spec.nullable) null else java.lang.Long.valueOf(0L) }
        else java.lang.Long.valueOf(
          Math.floorDiv(parseCsvDateTime(cell, spec), 1000000L))
      case arr => getArray(cell, CType.elementOf(arr), spec)
    }
  }

  /** csv GetDateTime: float parse first → UnixFloat, else layout chain. */
  private def parseCsvDateTime(cell: String, spec: ColumnSpec): Long =
    strictDouble(cell) match {
      case Some(d) => GoTimeLayouts.unixFloat(d, timeUnit)
      case None => parseDateTime(spec.sourceName, cell)
        .getOrElse(GoTimeLayouts.EpochMicros)
    }

  /** strconv.ParseFloat equivalent: full-string float or None. */
  private def strictDouble(s: String): Option[Double] =
    try Some(java.lang.Double.parseDouble(s)) catch { case _: Exception => None }

  /** fastfloat.ParseInt64BestEffort: 0 unless the whole string is an
    * in-range integer. */
  private def parseInt64BestEffort(s: String): Long =
    try java.lang.Long.parseLong(s) catch { case _: Exception => 0L }

  /** fastfloat.ParseBestEffort: 0 unless the whole string parses. */
  private def parseFloatBestEffort(s: String): Double =
    strictDouble(s).getOrElse(0.0)

  /** Array cells hold JSON (parser/csv.go:146-226) with gjson coercions —
    * same element rules as the JSON parser except non-integral numbers
    * clamp to 0 for Int (gjson e.Int() check). */
  private def getArray(cell: String, el: CType, spec: ColumnSpec): ArrayData = {
    val empty = new GenericArrayData(Array.empty[Any])
    if (cell == null || cell.isEmpty || cell.charAt(0) != '[') return empty
    val arr: JsonNode =
      try {
        val n = mapper.readTree(cell)
        if (n == null || !n.isArray || n.size == 0) return empty
        n
      } catch { case _: Exception => return empty }
    val out = new Array[Any](arr.size)
    var i = 0
    while (i < arr.size) {
      val e = arr.get(i)
      out(i) = el match {
        case CType.CInt =>
          if (e.isBoolean && e.booleanValue) 1L
          else if (e.isIntegralNumber && e.canConvertToLong) e.longValue
          else 0L
        case CType.CFloat => if (e.isNumber) e.doubleValue else 0.0
        case CType.CString =>
          if (e.isNull) UTF8String.EMPTY_UTF8
          else if (e.isTextual) UTF8String.fromString(e.textValue)
          else UTF8String.fromString(e.toString)
        case CType.CDateTime =>
          if (e.isNumber) GoTimeLayouts.unixFloat(e.doubleValue, timeUnit)
          else if (e.isTextual)
            parseDateTime(spec.sourceName, e.textValue)
              .getOrElse(GoTimeLayouts.EpochMicros)
          else GoTimeLayouts.EpochMicros
        case other => throw new IllegalStateException(s"array of $other")
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RFC-4180 single-record splitter (parser/csv.go:41-66 semantics). */
object Rfc4180 {
  /** None on malformed quoting. */
  def split(line: String, delim: Char): Option[Array[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    var inQuotes = false
    var quoted = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQuotes = false
        } else sb.append(c)
      } else if (c == '"') {
        if (sb.isEmpty && !quoted) { inQuotes = true; quoted = true }
        else return None
      } else if (c == delim) {
        out += sb.result(); sb.clear(); quoted = false
      } else {
        if (quoted) return None
        sb.append(c)
      }
      i += 1
    }
    if (inQuotes) None
    else { out += sb.result(); Some(out.toArray) }
  }
}
