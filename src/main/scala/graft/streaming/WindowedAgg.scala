package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a late-data watermark.
  *
  * The reference is ingest-time-only (SURVEY §2.6: no event-time windows
  * — its "time handling" is parse-and-store, parser/parser.go:29-63);
  * this is the Spark-native extension of that surface: the same windowed
  * rollup a user would otherwise compute in ClickHouse post-ingest,
  * pushed into the stream. Watermarking bounds state: a window's state is
  * dropped once `max(event_time) - lateness` passes its end, so state
  * size is O(active windows × keys), independent of stream length —
  * the property that makes this viable on an unbounded 100 TB stream.
  * Late rows beyond the watermark are dropped (counted by the engine's
  * `numRowsDroppedByWatermark` metric, the analog of the reference's
  * ParseMsgsErrorTotal-style counters).
  *
  * Works identically over a batch DataFrame (watermark is a no-op there),
  * so the same code serves backfill and live ingest.
  */
object WindowedAgg {

  /** Tumbling windows of `windowDur` per `keyCol`: row count + sum of
    * `valueCol`. In append output mode a window emits exactly once, when
    * the watermark passes its end. */
  def tumbling(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowDur: String, lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDur).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).as("total"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("n_rows"), col("total"))

  /** Sliding windows (`windowDur` every `slideDur`) — each row lands in
    * windowDur/slideDur windows; otherwise identical to [[tumbling]]. */
  def sliding(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowDur: String, slideDur: String, lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDur, slideDur).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).as("total"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("n_rows"), col("total"))

  /** Session windows: a key's window extends while events keep arriving
    * within `gap` of each other and closes after `gap` of silence —
    * activity sessions rather than wall-clock buckets. A session's state
    * lives until the watermark passes its (dynamic) end, so state stays
    * bounded by active sessions. */
  def session(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      gap: String, lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).as("total"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("n_rows"), col("total"))
}
