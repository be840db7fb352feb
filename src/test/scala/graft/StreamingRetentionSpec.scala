package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingRetention

/** Live retention flags: monotone OR accumulation across batches and
  * restarts, parity with the batch retentionConditions flags. */
class StreamingRetentionSpec extends SparkSuite {
  import spark.implicits._

  private def conds = Seq(
    col("e") === "signup", col("e") === "view", col("e") === "purchase")

  private def harness(): (
      Seq[(Long, String)] => Unit, () => Map[Long, (Int, Int, Int)]) = {
    val dir = Files.createTempDirectory("sret").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckDir = s"$dir/ck"
    Files.createDirectories(Paths.get(srcDir))
    var fileNo = 0
    def feed(rows: Seq[(Long, String)]): Unit = {
      fileNo += 1
      Files.write(Paths.get(srcDir, s"b$fileNo.csv"),
        rows.map { case (u, s) => s"$u,$s" }.mkString("\n").getBytes("UTF-8"))
      val src = spark.readStream.format("text").load(srcDir)
        .select(
          split(col("value"), ",").getItem(0).cast("long").as("k"),
          split(col("value"), ",").getItem(1).as("e"))
      StreamingRetention.flags(src, "k", conds)
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
    def latest(): Map[Long, (Int, Int, Int)] = {
      spark.read.parquet(outDir)
        .select("key", "r_0", "r_1", "r_2", "batch")
        .as[(Long, Int, Int, Int, Long)].collect()
        .groupBy(_._1).map { case (k, rs) =>
          val r = rs.maxBy(_._5); k -> ((r._2, r._3, r._4))
        }
    }
    (feed, latest)
  }

  test("flags accumulate across batches; anchor gates every slot") {
    val (feed, latest) = harness()
    feed(Seq((1L, "view"), (2L, "signup"), (3L, "purchase")))
    // no anchor for 1 and 3 yet; 2 has only the anchor
    assert(latest() === Map(1L -> ((0, 0, 0)), 2L -> ((1, 0, 0)),
      3L -> ((0, 0, 0))))
    // a later anchor retro-activates the earlier view for key 1
    feed(Seq((1L, "signup"), (2L, "purchase")))
    val m = latest()
    assert(m(1L) === ((1, 1, 0)))
    assert(m(2L) === ((1, 0, 1)))
  }

  test("cross-restart accumulation matches batch retentionConditions") {
    val rnd = new scala.util.Random(107)
    val types = Array("signup", "view", "purchase", "other")
    val all = (1 to 3).map { _ =>
      (1L to 30L).map(u => (u, types(rnd.nextInt(types.length))))
    }
    val (feed, latest) = harness()
    all.foreach(feed) // each feed is a separate query run on one checkpoint
    val got = latest()
    val flat = all.flatten
    for (u <- 1L to 30L) {
      val evs = flat.filter(_._1 == u).map(_._2).toSet
      val a = if (evs("signup")) 1 else 0
      val want = (a, a * (if (evs("view")) 1 else 0),
        a * (if (evs("purchase")) 1 else 0))
      assert(got(u) === want, s"user $u")
    }
  }

  test("non-integral key columns fail loudly, not as mid-batch nulls") {
    val df = Seq(("u1", "signup")).toDF("k", "e")
    intercept[IllegalArgumentException] {
      StreamingRetention.flags(df, "k", conds)
    }
  }

  test("restart with different conditions fails loudly") {
    val dir = Files.createTempDirectory("sret2").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(Paths.get(srcDir))
    def run(cs: Seq[org.apache.spark.sql.Column]): Unit = {
      val src = spark.readStream.format("text").load(srcDir)
        .select(
          split(col("value"), ",").getItem(0).cast("long").as("k"),
          split(col("value"), ",").getItem(1).as("e"))
      StreamingRetention.flags(src, "k", cs)
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$dir/out")
        }
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination(60000)
      ()
    }
    Files.write(Paths.get(srcDir, "b1.csv"), "1,signup".getBytes)
    run(conds)
    Files.write(Paths.get(srcDir, "b2.csv"), "1,view".getBytes)
    val ex = intercept[Exception] {
      run(Seq(col("e") === "view", col("e") === "signup",
        col("e") === "purchase"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("different conditions")))
  }
}
