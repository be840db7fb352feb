package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingTopK

/** Incremental SpaceSaving heavy hitters: exact under capacity across
  * batches and restarts; classic est/err invariants once evicting. */
class StreamingTopKSpec extends SparkSuite {
  import spark.implicits._

  private def harness(k: Int, capacity: Int): (
      Seq[(Long, String)] => Unit, () => Map[Long, Seq[(String, Long, Long)]]) = {
    val dir = Files.createTempDirectory("stopk").toString
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
          split(col("value"), ",").getItem(1).as("item"))
      StreamingTopK.topK(src, "k", "item", k, capacity)
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
    def latest(): Map[Long, Seq[(String, Long, Long)]] = {
      val rows = spark.read.parquet(outDir)
        .select("key", "terms", "ests", "errs", "batch")
        .as[(Long, Seq[String], Seq[Long], Seq[Long], Long)].collect()
      rows.groupBy(_._1).map { case (key, rs) =>
        val r = rs.maxBy(_._5)
        key -> r._2.indices.map(i => (r._2(i), r._3(i), r._4(i)))
      }
    }
    (feed, latest)
  }

  test("exact cumulative counts under capacity, across batches + restart") {
    val (feed, latest) = harness(k = 3, capacity = 8)
    feed(Seq((1L, "a"), (1L, "b"), (1L, "a"), (2L, "x")))
    assert(latest()(1L) === Seq(("a", 2L, 0L), ("b", 1L, 0L)))
    // second run = new query instance → state restored from checkpoint
    feed(Seq((1L, "b"), (1L, "b"), (1L, "c"), (2L, "x")))
    assert(latest()(1L) === Seq(("b", 3L, 0L), ("a", 2L, 0L), ("c", 1L, 0L)))
    assert(latest()(2L) === Seq(("x", 2L, 0L)))
  }

  test("over capacity: invariants hold vs exact counts fed across batches") {
    val rnd = new scala.util.Random(83)
    val all = Seq.fill(600)((1L, "w" + (math.pow(rnd.nextDouble(), 2) * 30).toInt))
    val (feed, latest) = harness(k = 6, capacity = 6)
    val (b1, b2) = all.splitAt(300)
    feed(b1); feed(b2)
    val exact = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = latest()(1L)
    assert(got.size === 6)
    got.foreach { case (t, est, err) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est >= tru, s"$t est=$est < true=$tru")
      assert(est - err <= tru, s"$t est-err=${est - err} > true=$tru")
    }
    // heavy-hitter completeness: anything above N/capacity is tracked
    val tracked = got.map(_._1).toSet
    exact.foreach { case (t, c) =>
      if (c > all.size / 6) assert(tracked(t), s"heavy $t missing")
    }
  }
}
