package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulDedup

/** Cross-batch stateful first-seen dedup: within-batch, across-batch, and
  * across-restart (state restored from the checkpoint). */
class StatefulDedupSpec extends SparkSuite {

  test("firstSeen emits one row per key across batches and restarts") {
    val dir = Files.createTempDirectory("dedup").toString
    val srcDir = s"$dir/in"
    val outDir = s"$dir/out"
    val ckDir = s"$dir/ck"
    Files.createDirectories(Paths.get(srcDir))

    def write(file: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(srcDir, file), lines.mkString("\n").getBytes("UTF-8"))

    def runOnce(): Unit = {
      val src = spark.readStream.format("text").load(srcDir)
        .select(
          split(col("value"), ",").getItem(0).as("k"),
          split(col("value"), ",").getItem(1).as("v"))
      StatefulDedup.firstSeen(src, "k")
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination(60000)
    }

    // batch 1: duplicate keys inside one batch
    write("b1.csv", Seq("a,1", "b,2", "a,3"))
    runOnce()
    val got1 = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got1.keySet === Set("a", "b"))
    assert(got1("a") === "1") // first occurrence wins

    // batch 2 after restart: old keys suppressed by checkpointed state
    write("b2.csv", Seq("a,9", "c,4"))
    runOnce()
    val got2 = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got2 === Map("a" -> "1", "b" -> "2", "c" -> "4"))
  }

  test("firstSeen in batch mode behaves as per-batch dedup") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val out = StatefulDedup.firstSeen(df, "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("a" -> 1L, "b" -> 3L))
  }
}
