package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage/task census of q32 (q18 LSH pairs + connected components):
  * prints every stage's task count, wall time, and shuffle volumes for
  * one cold run, so AQE partition collapse and driver-job overhead are
  * visible directly. */
object ProfileQ32 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.ArrayBuffer.empty[(Int, String, Int, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(40),
          i.numTasks, wall,
          i.taskMetrics.shuffleReadMetrics.totalBytesRead,
          i.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    })

    def run(label: String): Unit = {
      stages.clear()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q32_cluster_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(f"[q32] $label total=$total%6.2f s, ${stages.size} stages")
      stages.sortBy(_._1).foreach { case (id, name, n, wall, rd, wr) =>
        println(f"[q32]   stage $id%3d $name%-40s tasks=$n%3d " +
          f"wall=${wall / 1000.0}%6.2f s shufR=${rd / 1024}%8d KiB " +
          f"shufW=${wr / 1024}%8d KiB")
      }
    }
    run("warm-up")
    run("timed")
    spark.stop()
  }
}
