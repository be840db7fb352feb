package graft.schema

import org.apache.spark.sql.types._

/** Internal type lattice of the engine — mirrors the reference's 9-value
  * enum (model/value.go:24-35): Int, Float, String, DateTime,
  * ElasticDateTime plus the four array variants. Arrays are never nullable
  * and their elements are never null (model/value.go:112-123).
  */
sealed abstract class CType(val name: String) {
  def sparkType: DataType
}

object CType {
  case object CInt extends CType("Int") { val sparkType: DataType = LongType }
  case object CFloat extends CType("Float") { val sparkType: DataType = DoubleType }
  case object CString extends CType("String") { val sparkType: DataType = StringType }
  case object CDateTime extends CType("DateTime") { val sparkType: DataType = TimestampType }
  /** datetime carried as epoch seconds int64 (parser/fastjson.go:138-144) */
  case object CElasticDateTime extends CType("ElasticDateTime") { val sparkType: DataType = LongType }
  case object CIntArray extends CType("IntArray") {
    val sparkType: DataType = ArrayType(LongType, containsNull = false)
  }
  case object CFloatArray extends CType("FloatArray") {
    val sparkType: DataType = ArrayType(DoubleType, containsNull = false)
  }
  case object CStringArray extends CType("StringArray") {
    val sparkType: DataType = ArrayType(StringType, containsNull = false)
  }
  case object CDateTimeArray extends CType("DateTimeArray") {
    val sparkType: DataType = ArrayType(TimestampType, containsNull = false)
  }

  def elementOf(t: CType): CType = t match {
    case CIntArray => CInt
    case CFloatArray => CFloat
    case CStringArray => CString
    case CDateTimeArray => CDateTime
    case other => other
  }
}

/** One column of a target table: ClickHouse-style declared type mapped to
  * the internal lattice (the `ColumnWithType` of model/metric.go:41-46).
  *
  * @param sourceName message field to read (ClickHouse column name with
  *                   `.` unescaped, util/common.go:98-101)
  */
final case class ColumnSpec(
    name: String,
    ctype: CType,
    nullable: Boolean,
    sourceName: String) {

  def field: StructField = StructField(name, ctype.sparkType, nullable)
}

object ColumnSpec {
  def apply(name: String, chTypeStr: String): ColumnSpec = {
    val (t, n) = ChType.parse(chTypeStr)
    ColumnSpec(name, t, n, sourceName(name))
  }

  /** `\.` in a ClickHouse column name maps to `.` in the message field. */
  def sourceName(name: String): String = name.replace("\\.", ".")
}

/** ClickHouse type-string → internal type (`WhichType`,
  * model/value.go:100-169). LowCardinality wrappers are assumed already
  * stripped by the schema-discovery layer (output/clickhouse.go:43,110).
  */
object ChType {
  import CType._

  private val scalar: Map[String, CType] = {
    val ints = Seq("UInt8", "UInt16", "UInt32", "UInt64",
      "Int8", "Int16", "Int32", "Int64").map(_ -> (CInt: CType))
    val floats = Seq("Float32", "Float64").map(_ -> (CFloat: CType))
    val strs = Seq("String", "UUID").map(_ -> (CString: CType))
    val dts = Seq("Date", "DateTime").map(_ -> (CDateTime: CType))
    (ints ++ floats ++ strs ++ dts).toMap + ("ElasticDateTime" -> CElasticDateTime)
  }

  private def toArray(t: CType): CType = t match {
    case CInt => CIntArray
    case CFloat => CFloatArray
    case CString => CStringArray
    case CDateTime => CDateTimeArray
    case other =>
      throw new IllegalArgumentException(s"unsupported array element $other")
  }

  /** Strip `LowCardinality(...)` wrappers anywhere in the type string. */
  def stripLowCardinality(typ: String): String =
    "\\bLowCardinality\\((.*)\\)".r.replaceAllIn(typ, m => m.group(1))

  def parse(raw: String): (CType, Boolean) = {
    val typ0 = stripLowCardinality(raw.trim)
    val nullable = typ0.startsWith("Nullable(")
    val typ = if (nullable) typ0.stripPrefix("Nullable(").stripSuffix(")") else typ0

    def prefix(t: String): Option[CType] =
      if (t.startsWith("DateTime64")) Some(CDateTime)
      else if (t.startsWith("Decimal")) Some(CFloat)
      else if (t.startsWith("FixedString")) Some(CString)
      else if (t.startsWith("Enum8(") || t.startsWith("Enum16(")) Some(CString)
      else None

    if (typ.startsWith("Array(")) {
      val inner0 = typ.stripPrefix("Array(").stripSuffix(")")
      // Nullable inside Array is ignored: arrays are never nullable.
      val inner = if (inner0.startsWith("Nullable("))
        inner0.stripPrefix("Nullable(").stripSuffix(")") else inner0
      val el = scalar.get(inner).orElse(prefix(inner)).getOrElse(
        throw new IllegalArgumentException(s"unsupported ClickHouse type $raw"))
      (toArray(el), false)
    } else {
      val t = scalar.get(typ).orElse(prefix(typ)).getOrElse(
        throw new IllegalArgumentException(s"unsupported ClickHouse type $raw"))
      (t, nullable)
    }
  }
}
