package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.WindowedAgg

/** Event-time window + watermark semantics: append-mode emission only
  * after the watermark passes a window's end, exactly-once emission per
  * window, and late-data drop past the watermark.
  */
class WindowedAggSpec extends SparkSuite {

  test("batch mode: tumbling windows aggregate by event time") {
    import spark.implicits._
    val df = Seq(
      ("2022-01-29 08:00:30", "a", 1.0),
      ("2022-01-29 08:04:59", "a", 2.0),
      ("2022-01-29 08:04:59", "b", 10.0),
      ("2022-01-29 08:06:10", "a", 4.0))
      .toDF("ts_s", "k", "v")
      .select(to_timestamp(col("ts_s")).as("ts"), col("k"), col("v"))
    val got = WindowedAgg.tumbling(df, "ts", "k", "v", "5 minutes", "10 minutes")
      .orderBy("win_start", "k")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(got === Array(
      ("2022-01-29 08:00:00.0", "a", 2L, 3.0),
      ("2022-01-29 08:00:00.0", "b", 1L, 10.0),
      ("2022-01-29 08:05:00.0", "a", 1L, 4.0)))
  }

  test("batch mode: session windows split on gap, merge within gap") {
    import spark.implicits._
    val df = Seq(
      ("2022-01-29 08:00:00", "a", 1.0),
      ("2022-01-29 08:03:00", "a", 2.0),  // within 5-min gap → same session
      ("2022-01-29 08:20:00", "a", 4.0),  // 17 min silence → new session
      ("2022-01-29 08:01:00", "b", 8.0))
      .toDF("ts_s", "k", "v")
      .select(to_timestamp(col("ts_s")).as("ts"), col("k"), col("v"))
    val got = WindowedAgg.session(df, "ts", "k", "v", "5 minutes", "10 minutes")
      .orderBy("k", "win_start")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(got === Array(
      // session end = last event + gap
      ("2022-01-29 08:00:00.0", "2022-01-29 08:08:00.0", "a", 2L, 3.0),
      ("2022-01-29 08:20:00.0", "2022-01-29 08:25:00.0", "a", 1L, 4.0),
      ("2022-01-29 08:01:00.0", "2022-01-29 08:06:00.0", "b", 1L, 8.0)))
  }

  test("streaming append mode: emit-after-watermark, late rows dropped") {
    val base = Files.createTempDirectory("winagg").toString
    val srcDir = s"$base/src"; val ckDir = s"$base/ck"
    new java.io.File(srcDir).mkdirs()

    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(srcDir, name), lines.mkString("\n").getBytes("UTF-8"))

    // batch 1: two 5-min windows' worth of events
    writeFile("b1.csv", Seq(
      "2022-01-29 08:00:30,a,1.0",
      "2022-01-29 08:04:59,a,2.0",
      "2022-01-29 08:04:59,b,10.0",
      "2022-01-29 08:06:10,a,4.0"))

    val src = spark.readStream.format("text").load(srcDir)
      .select(split(col("value"), ",").as("f"))
      .select(to_timestamp(col("f").getItem(0)).as("ts"),
        col("f").getItem(1).as("k"),
        col("f").getItem(2).cast("double").as("v"))
    val agg = WindowedAgg.tumbling(src, "ts", "k", "v", "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").option("checkpointLocation", ckDir).start()
    try {
      q.processAllAvailable()
      // watermark still behind both windows: nothing emitted yet
      assert(spark.table("winagg").count() === 0)

      // batch 2 advances max event time to 08:20:01 → watermark (after
      // this batch) = 08:10:01, past both earlier windows' ends
      writeFile("b2.csv", Seq("2022-01-29 08:20:01,a,8.0"))
      q.processAllAvailable()
      // batch 3 (any trigger) emits the closed windows using that watermark
      writeFile("b3.csv", Seq("2022-01-29 08:21:00,b,9.0"))
      q.processAllAvailable()
      val emitted = spark.table("winagg")
        .orderBy("win_start", "k")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4)))
      assert(emitted === Array(
        ("2022-01-29 08:00:00.0", "a", 2L, 3.0),
        ("2022-01-29 08:00:00.0", "b", 1L, 10.0),
        ("2022-01-29 08:05:00.0", "a", 1L, 4.0)))

      // batch 4: a row at 08:02 is far behind the 08:10:01 watermark →
      // dropped; the closed 08:00 window must NOT re-emit or change
      writeFile("b4.csv", Seq(
        "2022-01-29 08:02:00,a,100.0", // late — dropped
        "2022-01-29 08:22:00,a,5.0"))  // on time
      q.processAllAvailable()
      val after = spark.table("winagg")
        .filter(col("win_start") === "2022-01-29 08:00:00")
        .agg(sum("total")).head().getDouble(0)
      assert(after === 13.0) // 3.0 (a) + 10.0 (b), late 100.0 not applied
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1, s"expected the late row counted as dropped, got $dropped")
    } finally q.stop()
  }
}
