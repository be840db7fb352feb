package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.StreamJoin

/** Stream-stream interval join: in-window match, out-of-window miss,
  * cross-micro-batch buffering, and watermark state cleanup (a click
  * arriving after the watermark passed its impression's window must not
  * match — the buffered impression is gone). */
class StreamJoinSpec extends SparkSuite {

  test("attribution join matches clicks within the window, state bounded") {
    val base = Files.createTempDirectory("sjoin").toString
    val impDir = s"$base/imp"; val clkDir = s"$base/clk"; val ck = s"$base/ck"
    new java.io.File(impDir).mkdirs(); new java.io.File(clkDir).mkdirs()

    def put(dir: String, name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))

    def src(dir: String, ts: String, id: String) =
      spark.readStream.format("text").load(dir)
        .select(split(col("value"), ",").as("f"))
        .select(to_timestamp(col("f").getItem(0)).as(ts),
          col("f").getItem(1).as("user"),
          col("f").getItem(2).as(id))

    // impressions arrive first; matching click is in a LATER micro-batch
    // (exercises the left-side buffer)
    put(impDir, "i1.csv", Seq(
      "2022-03-01 09:00:00,u1,imp1",
      "2022-03-01 09:00:00,u2,imp2"))
    put(clkDir, "c0.csv", Seq("2022-03-01 09:00:01,u9,clk0")) // no imp

    val joined = StreamJoin.intervalJoin(
      src(impDir, "ts_imp", "imp_id"), src(clkDir, "ts_clk", "clk_id"),
      "user", "ts_imp", "ts_clk",
      lower = "0 seconds", upper = "10 minutes", lateness = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("sjoin").count() === 0)

      // u1 clicks inside the window; u2 clicks outside it (11 min later)
      put(clkDir, "c1.csv", Seq(
        "2022-03-01 09:05:00,u1,clk1",
        "2022-03-01 09:11:00,u2,clk2"))
      q.processAllAvailable()
      val got = spark.table("sjoin")
        .select("user", "imp_id", "clk_id").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(got.toSet === Set(("u1", "imp1", "clk1")))

      // advance both watermarks far past imp1/imp2's windows, then send
      // a click that WOULD have matched imp2's window — its impression
      // state has been evicted, so it must not produce a row
      put(impDir, "i2.csv", Seq("2022-03-01 10:00:00,u8,imp8"))
      put(clkDir, "c2.csv", Seq("2022-03-01 10:00:00,u8,clk8"))
      q.processAllAvailable()
      put(clkDir, "c3.csv", Seq("2022-03-01 09:02:00,u2,clk-late"))
      q.processAllAvailable()
      val after = spark.table("sjoin")
        .select("user", "imp_id", "clk_id").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(after === Set(("u1", "imp1", "clk1"), ("u8", "imp8", "clk8")),
        "late click matched an evicted impression")
    } finally q.stop()
  }
}
