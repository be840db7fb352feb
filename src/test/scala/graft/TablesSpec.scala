package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins [[Tables]]' timestamp normalization: whatever physical parquet
  * type the driver's generator emits for `ts` (INT64 nanos in earlier
  * rounds, µs TIMESTAMP_NTZ after the round-7 regeneration), readers see
  * one canonical TIMESTAMP with UTC session semantics, so `unix_micros`
  * and time striping behave identically across data generations. */
class TablesSpec extends SparkSuite {

  test("NTZ parquet ts is normalized to TIMESTAMP with identical micros") {
    val dir = Files.createTempDirectory("tables-ntz").toFile
    dir.deleteOnExit()
    import spark.implicits._
    val micros = 1700000000123456L
    spark.range(1)
      .select(timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    // precondition: the parquet really round-trips as NTZ
    val raw = spark.read.parquet(s"${dir.getAbsolutePath}/events.parquet")
    assert(raw.schema("ts").dataType === TimestampNTZType)

    val df = Tables(spark, dir.getAbsolutePath, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }
}
