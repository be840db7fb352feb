package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.EventAnalytics
import graft.streaming.StreamingDecayedAvg

/** Incremental time-decayed average: the re-anchored O(1) state fold
  * equals the batch closed form over everything seen so far, across
  * micro-batches, checkpoint restarts, and a late straggler. */
class StreamingDecayedAvgSpec extends SparkSuite {
  import spark.implicits._

  private val h = 1000L

  private def batchEma(
      rows: Seq[(Long, Long, Long, Double)]): Map[Long, (Long, Double)] =
    EventAnalytics.timeDecayedAvg(
        rows.toDF("user_id", "__us", "event_id", "value")
          .withColumn("ts", timestamp_micros(col("__us"))),
        "user_id", "ts", "value", h)
      .select("user_id", "n_events", "ema")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("streaming fold equals the batch closed form across batches") {
    val dir = Files.createTempDirectory("sema").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckDir = s"$dir/ck"
    Files.createDirectories(Paths.get(srcDir))
    var fileNo = 0
    def feed(rows: Seq[(Long, Long, Long, Double)]): Unit = {
      fileNo += 1
      Files.write(Paths.get(srcDir, s"b$fileNo.csv"),
        rows.map { case (u, t, e, v) => s"$u,$t,$e,$v" }
          .mkString("\n").getBytes("UTF-8"))
      val src = spark.readStream.format("text").load(srcDir)
        .select(
          split(col("value"), ",").getItem(0).cast("long").as("k"),
          timestamp_micros(
            split(col("value"), ",").getItem(1).cast("long")).as("ts"),
          split(col("value"), ",").getItem(2).cast("long").as("tie"),
          split(col("value"), ",").getItem(3).cast("double").as("v"))
      StreamingDecayedAvg.levels(src, "k", "ts", "tie", "v", h)
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
    def latest(): Map[Long, (Long, Double)] = {
      val rows = spark.read.parquet(outDir)
        .select("key", "n_events", "ema", "batch")
        .as[(Long, Long, Double, Long)].collect()
      rows.groupBy(_._1).map { case (k, rs) =>
        val r = rs.maxBy(_._4); k -> ((r._2, r._3)) }
    }
    def check(seen: Seq[(Long, Long, Long, Double)]): Unit = {
      val want = batchEma(seen)
      val got = latest()
      assert(got.keySet === want.keySet)
      got.foreach { case (k, (n, ema)) =>
        assert(n === want(k)._1, s"key $k n")
        // the batch operator µ-rounds its ema to 6 decimals; the
        // streaming value is unrounded — tolerance absorbs that rounding
        assert(math.abs(ema - want(k)._2) < 1e-6, s"key $k ema")
      }
    }

    val rnd = new scala.util.Random(97)
    def mk(n: Int, tLo: Long): Seq[(Long, Long, Long, Double)] =
      Seq.tabulate(n)(i => ((i % 5).toLong, tLo + rnd.nextInt(3000),
        tLo + i, math.rint(rnd.nextDouble() * 1e4) / 100.0))

    val b1 = mk(60, 0L)
    feed(b1); check(b1)
    // restart from the checkpoint, later time range
    val b2 = mk(60, 4000L)
    feed(b2); check(b1 ++ b2)
    // a late straggler BEHIND every key's anchor folds at its batch weight
    val late = Seq((0L, 100L, 9999L, 42.0))
    feed(late); check(b1 ++ b2 ++ late)
  }
}
