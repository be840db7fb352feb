package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.EventAnalytics
import graft.streaming.StreamingFunnel

/** Incremental windowFunnel: per-batch levels equal the batch operator
  * run over the data seen so far (same [[graft.functions.FunnelScan]]
  * recurrence, so equality is exact), state survives restarts via the
  * checkpoint, and strict-mode interrupts persist across batches. */
class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private val steps = Seq("A", "B", "C")
  private val w = 1000000L // 1 s window over µs fixtures

  private def batchLevels(
      lines: Seq[(Long, Long, Long, String)],
      dedup: Boolean = false): Map[Long, Int] =
    EventAnalytics.funnelLevelsModes(
        lines.toDF("user_id", "__us", "event_id", "event_type")
          .withColumn("ts", timestamp_micros(col("__us"))),
        "user_id", "ts", "event_type", steps, w,
        strictDedup = dedup)
      .select("user_id", "funnel_level").as[(Long, Int)].collect().toMap

  private def harness(dedup: Boolean = false): (
      String, Seq[(Long, Long, Long, String)] => Unit, () => Map[Long, Int]) = {
    val dir = Files.createTempDirectory("sfunnel").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckDir = s"$dir/ck"
    Files.createDirectories(Paths.get(srcDir))
    var fileNo = 0
    def feedAndRun(rows: Seq[(Long, Long, Long, String)]): Unit = {
      fileNo += 1
      Files.write(Paths.get(srcDir, s"b$fileNo.csv"),
        rows.map { case (u, t, e, ty) => s"$u,$t,$e,$ty" }
          .mkString("\n").getBytes("UTF-8"))
      val src = spark.readStream.format("text").load(srcDir)
        .select(
          split(col("value"), ",").getItem(0).cast("long").as("user_id"),
          timestamp_micros(
            split(col("value"), ",").getItem(1).cast("long")).as("ts"),
          split(col("value"), ",").getItem(2).cast("long").as("event_id"),
          split(col("value"), ",").getItem(3).as("event_type"))
      StreamingFunnel.levels(src, "user_id", "ts", "event_id",
          "event_type", steps, w, strictDedup = dedup)
        .writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination(60000)
    }
    def latest(): Map[Long, Int] = {
      val rows = spark.read.parquet(outDir)
        .select("key", "funnel_level", "batch")
        .as[(Long, Int, Long)].collect()
      rows.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._3)._2 }
    }
    (dir, feedAndRun, latest)
  }

  test("levels accumulate across batches and restarts, matching batch") {
    val (_, feed, latest) = harness()
    // batch 1: user 1 reaches A→B; user 2 only A
    val b1 = Seq((1L, 0L, 1L, "A"), (1L, 10L, 2L, "B"), (2L, 0L, 3L, "A"))
    feed(b1)
    assert(latest() === batchLevels(b1))
    // batch 2 (new query instance → checkpoint restore): user 1
    // completes the chain, user 2's B arrives OUTSIDE the window from
    // its A, user 3 appears fresh
    val b2 = Seq((1L, 20L, 4L, "C"), (2L, 2000000L, 5L, "B"),
      (3L, 0L, 6L, "A"))
    feed(b2)
    assert(latest() === batchLevels(b1 ++ b2))
    assert(latest()(1L) === 3)
    assert(latest()(2L) === 1)
  }

  test("strict_dedup interrupt persists across the batch boundary") {
    val (_, feed, latest) = harness(dedup = true)
    // A,B then a REPEATED B: processing interrupts at level 2
    feed(Seq((1L, 0L, 1L, "A"), (1L, 1L, 2L, "B"), (1L, 2L, 3L, "B")))
    assert(latest()(1L) === 2)
    // a C in the next batch must NOT resurrect the chain
    feed(Seq((1L, 3L, 4L, "C")))
    assert(latest()(1L) === 2)
    assert(latest() === batchLevels(Seq(
      (1L, 0L, 1L, "A"), (1L, 1L, 2L, "B"), (1L, 2L, 3L, "B"),
      (1L, 3L, 4L, "C")), dedup = true))
  }

  test("a later chain start re-opens the window across batches") {
    val (_, feed, latest) = harness()
    feed(Seq((1L, 0L, 1L, "A")))
    // fresh A inside batch 2, B and C hang off it within the window
    feed(Seq((1L, 5000000L, 2L, "A"), (1L, 5000010L, 3L, "B"),
      (1L, 5000020L, 4L, "C")))
    assert(latest()(1L) === 3)
  }
}
