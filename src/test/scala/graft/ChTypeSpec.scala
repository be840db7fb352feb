package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{ChType, ColumnSpec, CType}
import graft.schema.CType._

/** ClickHouse type-string → internal lattice (`WhichType`,
  * model/value.go:100-169) and source-name dot-escape
  * (util/common.go:98-101).
  */
class ChTypeSpec extends AnyFunSuite {

  test("scalar types") {
    for (t <- Seq("UInt8", "UInt16", "UInt32", "UInt64", "Int8", "Int16", "Int32", "Int64"))
      assert(ChType.parse(t) === ((CInt, false)), t)
    assert(ChType.parse("Float32") === ((CFloat, false)))
    assert(ChType.parse("Float64") === ((CFloat, false)))
    // Decimal is treated as Float — deliberate precision loss
    // (model/value.go:115-118)
    for (t <- Seq("Decimal", "Decimal32(3)", "Decimal64(9)", "Decimal128(20)", "Decimal(18,4)"))
      assert(ChType.parse(t) === ((CFloat, false)), t)
    for (t <- Seq("String", "UUID", "FixedString(16)", "Enum8('a'=1)", "Enum16('b'=2)"))
      assert(ChType.parse(t) === ((CString, false)), t)
    for (t <- Seq("Date", "DateTime", "DateTime64(3)", "DateTime64(3, 'UTC')"))
      assert(ChType.parse(t) === ((CDateTime, false)), t)
    assert(ChType.parse("ElasticDateTime") === ((CElasticDateTime, false)))
  }

  test("Nullable wrapper") {
    assert(ChType.parse("Nullable(Int64)") === ((CInt, true)))
    assert(ChType.parse("Nullable(DateTime64(3))") === ((CDateTime, true)))
    assert(ChType.parse("Nullable(String)") === ((CString, true)))
  }

  test("Array types are never nullable (model/value.go:112-123)") {
    assert(ChType.parse("Array(Int64)") === ((CIntArray, false)))
    assert(ChType.parse("Array(Float64)") === ((CFloatArray, false)))
    assert(ChType.parse("Array(String)") === ((CStringArray, false)))
    assert(ChType.parse("Array(DateTime64(3))") === ((CDateTimeArray, false)))
    assert(ChType.parse("Array(Nullable(Int64))") === ((CIntArray, false)))
  }

  test("LowCardinality stripped (output/clickhouse.go:43,110)") {
    assert(ChType.parse("LowCardinality(String)") === ((CString, false)))
    assert(ChType.parse("Nullable(LowCardinality(String))") === ((CString, true)))
    assert(ChType.stripLowCardinality("Array(LowCardinality(String))") === "Array(String)")
  }

  test("unsupported types throw") {
    intercept[IllegalArgumentException](ChType.parse("Tuple(Int64, String)"))
    intercept[IllegalArgumentException](ChType.parse("Map(String, Int64)"))
  }

  test("source-name dot-escape (util/common.go:98-101)") {
    assert(ColumnSpec.sourceName("a\\.b") === "a.b")
    assert(ColumnSpec.sourceName("plain") === "plain")
    assert(ColumnSpec("x", "Nullable(Int64)") ===
      ColumnSpec("x", CInt, nullable = true, "x"))
  }
}
