package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.schema.CType
import graft.streaming.{AutoSchema, IdempotentParquetSink, TaskConfig}

/** Auto-schema derivation from target metadata + replay-idempotent sink. */
class AutoSchemaSpec extends SparkSuite {

  test("derive maps ClickHouse type strings, strips LowCardinality, excludes") {
    val target = () => Seq(
      ("time", "DateTime"),
      ("name", "LowCardinality(String)"),
      ("value", "Float32"),
      ("tags", "Array(Nullable(String))"),
      ("maybe", "Nullable(Int64)"),
      ("day", "Date")) // excluded below
    val specs = AutoSchema.derive(target, excludeColumns = Seq("day"))
    assert(specs.map(s => (s.name, s.ctype, s.nullable)) === Seq(
      ("time", CType.CDateTime, false),
      ("name", CType.CString, false),
      ("value", CType.CFloat, false),
      ("tags", CType.CStringArray, false),
      ("maybe", CType.CInt, true)))
  }

  test("configure swaps the task's columns in") {
    val cfg = TaskConfig.fromJson(
      """{"name": "auto", "topic": "t", "parser": "json", "tableName": "t",
        |"dims": []}""".stripMargin)
    val out = AutoSchema.configure(cfg, () => Seq(("v", "Int64")))
    assert(out.columns.map(_.name) === Seq("v"))
  }

  test("idempotent sink: replayed batch does not duplicate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idem").toString
    val sink = new IdempotentParquetSink(dir)
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    sink.write(b0, 0L)
    sink.write(b1, 1L)
    sink.write(b0, 0L) // crash-replay of batch 0
    val got = spark.read.parquet(dir)
    assert(got.count() === 3)
    assert(got.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }
}
