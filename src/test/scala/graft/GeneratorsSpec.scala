package graft

import org.apache.spark.sql.functions._

import graft.sources.Generators
import graft.streaming.{TaskConfig, TaskRunner}

/** Data generators (S4) feed the pipeline end-to-end without a broker. */
class GeneratorsSpec extends SparkSuite {

  test("access-log generator parses clean through a typed task") {
    val cfg = TaskConfig.fromJson(
      """{"name": "gen", "topic": "logs", "parser": "json", "tableName": "t",
        |"dims": [
        |  {"name": "@timestamp", "type": "DateTime"},
        |  {"name": "clientip", "type": "String"},
        |  {"name": "status", "type": "Int64"},
        |  {"name": "size", "type": "Int64"}]}""".stripMargin)
    val out = TaskRunner.build(cfg)(Generators.accessLogJson(spark, 1000))
    assert(out.count() === 1000)
    assert(out.filter(col("clientip") === "").count() === 0)
    assert(out.filter(col("status") < 200).count() === 0)
  }

  test("metric generator works with the series columns") {
    val cfg = TaskConfig.fromJson(
      """{"name": "genm", "topic": "m", "parser": "json", "tableName": "t",
        |"dims": [
        |  {"name": "__name__", "type": "String"},
        |  {"name": "timestamp", "type": "DateTime"},
        |  {"name": "value", "type": "Float64"},
        |  {"name": "instance", "type": "String"},
        |  {"name": "job", "type": "String"}]}""".stripMargin)
    val parsed = TaskRunner.build(cfg)(Generators.metricJson(spark, 500))
    val withSeries = graft.sources.MessageParser.withSeriesColumns(
      parsed, Seq("__name__", "instance", "job"), "__name__")
    // 10 names × 50 instances × 5 jobs, but id-derived so correlated:
    // distinct series = distinct (name, instance, job) combos present
    val distinctSeries = withSeries.select("__series_id").distinct().count()
    val distinctCombos = parsed.select("__name__", "instance", "job").distinct().count()
    assert(distinctSeries === distinctCombos)
  }

  test("prometheusSchema config wires series columns into the task") {
    val cfg = TaskConfig.fromJson(
      """{"name": "prom", "topic": "m", "parser": "json", "tableName": "t",
        |"prometheusSchema": true,
        |"dims": [
        |  {"name": "__name__", "type": "String"},
        |  {"name": "value", "type": "Float64"},
        |  {"name": "instance", "type": "String"}]}""".stripMargin)
    assert(cfg.prometheusSchema)
    val out = TaskRunner.build(cfg)(Generators.metricJson(spark, 100))
    assert(out.columns.contains("__series_id"))
    assert(out.columns.contains("labels"))
    assert(out.select("__series_id").distinct().count() > 1)
  }

  test("roundupShift matches GetShift (util/common.go:104-108)") {
    import graft.operators.Sharding.roundupShift
    assert(roundupShift(1) === 0)
    assert(roundupShift(2) === 1)
    assert(roundupShift(3) === 2)
    assert(roundupShift(50000) === 16)
    assert(roundupShift(262144) === 18)
  }
}
