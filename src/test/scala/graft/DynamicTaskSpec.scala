package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{DynamicTask, ParquetSink, TaskConfig}

/** The dynamic-schema end-to-end flow (go.test.sh's dynamic mode): the
  * five message cohorts evolve the schema by ten columns, DDL fires once
  * per column, and the final sink output carries every evolved column
  * with reference-coerced values. */
class DynamicTaskSpec extends SparkSuite {

  private class CollectingDdl extends DynamicTask.DdlExecutor {
    val stmts = scala.collection.mutable.ArrayBuffer.empty[String]
    override def execute(sql: String): Unit = stmts += sql
  }

  test("backfill evolves schema, ingests all rows, values coerced") {
    import spark.implicits._
    val cfg0 = TaskConfig.fromJson(
      """{"name": "dyn", "topic": "t", "parser": "json",
        |"tableName": "db.dyn",
        |"dims": [
        |  {"name": "time", "type": "DateTime"},
        |  {"name": "name", "type": "String"},
        |  {"name": "value", "type": "Float64"}],
        |"dynamicSchema": {"enable": true}}""".stripMargin)

    def msg(i: Int, extra: String = ""): String = {
      val e = if (extra.isEmpty) "" else s", $extra"
      s"""{"time": "2022-01-29 08:20:36", "name": "name$i", "value": $i$e}"""
    }
    // go.test.sh:27-42 cohort shapes, 100 rows
    val lines = (0 until 100).map { i =>
      if (i < 20) msg(i, s""""newkey01": $i""")
      else if (i < 40) msg(i,
        s""""newkey02": $i.5, "newkey03": "s$i", "newkey04": "2009-07-13T09:07:13Z", "newkey05": {"x": $i}""")
      else if (i < 60) msg(i,
        s""""newkey06": [$i], "newkey07": [$i.5], "newkey08": ["a"], "newkey09": ["2009-07-13"], "newkey10": [{"y": 1}]""")
      else msg(i)
    }
    val messages = lines.zipWithIndex
      .map { case (v, off) => (v, "t", 0, off.toLong) }
      .toDF("value", "topic", "partition", "offset")

    val ddl = new CollectingDdl
    val outDir = Files.createTempDirectory("graft_dyn").toString
    val cfg = DynamicTask.backfill(spark, cfg0, messages, new ParquetSink(outDir), ddl)

    // evolved column set == the reference's e2e assertion (go.test.sh:64-66)
    assert(cfg.columns.drop(3).map(_.name) === (1 to 10).map(i => f"newkey$i%02d"))
    assert(ddl.stmts.size === 10)
    assert(ddl.stmts.head ===
      "ALTER TABLE db.dyn ADD COLUMN IF NOT EXISTS `newkey01` Nullable(Int64)")

    val out = spark.read.parquet(outDir)
    assert(out.count() === 100)
    assert(out.schema.fieldNames.toSet.contains("newkey10"))
    // coercions: absent newkey01 on later cohorts → null (Nullable);
    // arrays default to [] where missing
    assert(out.filter(col("newkey01").isNull).count() === 80)
    assert(out.filter(col("name") === "name5").select("newkey01").head().getLong(0) === 5L)
    assert(out.filter(col("name") === "name45").select("newkey06").head()
      .getSeq[Long](0) === Seq(45L))
    assert(out.filter(col("name") === "name99").select("newkey06").head()
      .getSeq[Long](0) === Seq.empty)
    // objects stringify through String columns
    assert(out.filter(col("name") === "name25").select("newkey05").head()
      .getString(0) === """{"x":25}""")
  }
}
