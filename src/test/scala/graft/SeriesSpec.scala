package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.MessageParser
import graft.streaming.SeriesParquetSink

/** Prometheus-mode series id / labels rendering (model/message.go:171-212)
  * and first-seen series-dedup writes (output/clickhouse.go:110-159). */
class SeriesSpec extends SparkSuite {

  private def metricsDF = {
    import spark.implicits._
    Seq(
      (1L, 10.0, "cpu", "host1", "j1"),
      (2L, 11.0, "cpu", "host1", "j1"), // same series as row 1
      (3L, 12.0, "cpu", "host2", "j1"),
      (4L, 13.0, "mem", "host1", ""))   // empty label excluded from hash+labels
      .toDF("ts", "value", "__name__", "instance", "job")
  }

  test("series id is xxhash64-seed0 of ###name###value segments; labels exclude name key and le") {
    val out = MessageParser.withSeriesColumns(
      metricsDF, Seq("__name__", "instance", "job"), nameKey = "__name__")
    val rows = out.select("ts", "__series_id", "labels").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList

    val id1 = rows.find(_._1 == 1L).get._2
    val id2 = rows.find(_._1 == 2L).get._2
    val id3 = rows.find(_._1 == 3L).get._2
    assert(id1 === id2) // identical label sets → same series
    assert(id1 !== id3)
    assert(rows.find(_._1 == 1L).get._3 === """{"instance": "host1", "job": "j1"}""")
    // empty label value drops out of the rendered labels
    assert(rows.find(_._1 == 4L).get._3 === """{"instance": "host1"}""")

    // pin the hash to the reference's input string construction
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.unsafe.types.UTF8String
    val expected = new XxHash64(Seq(Literal(
      UTF8String.fromString("###__name__###cpu###instance###host1###job###j1"),
      org.apache.spark.sql.types.StringType)), 0L)
      .eval(InternalRow.empty).asInstanceOf[Long]
    assert(id1 === expected)
  }

  test("series sink writes each series once across batches") {
    val dir = Files.createTempDirectory("graft_series").toString
    val sink = new SeriesParquetSink(
      s"$dir/metrics", s"$dir/series",
      seriesCols = Seq("__series_id", "labels"),
      metricCols = Seq("ts", "value", "__series_id"))
    val enriched = MessageParser.withSeriesColumns(
      metricsDF, Seq("__name__", "instance", "job"), nameKey = "__name__")

    sink.write(enriched.filter(col("ts") <= 2), 0L)
    sink.write(enriched.filter(col("ts") >= 2), 1L) // ts=2 series re-appears
    val series = spark.read.parquet(s"$dir/series")
    val metrics = spark.read.parquet(s"$dir/metrics")
    assert(metrics.count() === 5) // 2 + 3 rows (ts=2 delivered twice)
    assert(series.count() === 3) // distinct series only
    assert(series.select("__series_id").distinct().count() === 3)
  }
}
