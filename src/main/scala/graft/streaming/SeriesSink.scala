package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Prometheus-mode series-dedup write (SURVEY §2.5 W4,
  * output/clickhouse.go:110-159,196-221): each batch splits at the series
  * boundary — numeric dims + `__series_id` go to the metric table; the
  * string dims render into `labels` and land in the `<table>_series` side
  * table at most once per `__series_id` (first-seen), seeded from what
  * the series table already contains (the roaring-bitmap preload's
  * analog is an anti-join against the stored ids — state lives in the
  * table itself, so restarts need no separate recovery).
  */
final class SeriesParquetSink(
    metricPath: String,
    seriesPath: String,
    seriesCols: Seq[String],
    metricCols: Seq[String]) extends BatchSink {

  override def write(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val newSeries = batch
      .select(seriesCols.map(col): _*)
      .dropDuplicates("__series_id")
    // only the first-batch "path does not exist" may skip the anti-join;
    // a transient read failure must PROPAGATE — treating it as
    // no-table-yet would re-append every series id in the batch and
    // break the at-most-once-per-series contract
    val existing =
      try spark.read.parquet(seriesPath).select("__series_id")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" => null
      }
    val fresh =
      if (existing == null) newSeries
      else newSeries.join(existing, Seq("__series_id"), "left_anti")
    fresh.write.mode(SaveMode.Append).parquet(seriesPath)
    batch.select(metricCols.map(col): _*)
      .write.mode(SaveMode.Append).parquet(metricPath)
  }
}
