package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** r19 optimization-round measurement harness: per-stage decomposition of
  * any SparkEntry query via a SparkListener — stage wall time, task count,
  * input / shuffle-read / shuffle-write bytes — so "where does the time
  * go" is answered by the scheduler's own numbers instead of black-box
  * wall clocks (optimization guide §1.1 "empirical"). Follows the
  * TimeQ protocol (untimed warm-up, System.gc(), timed pass with the
  * noop sink) so numbers are comparable with Bench rows.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfileStages q41_corpus_build"
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageRow(id: Int, name: String, ms: Long, tasks: Int,
        runMs: Long, deserMs: Long, gcMs: Long, resMs: Long,
        inputMB: Double, srMB: Double, swMB: Double)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += StageRow(si.stageId,
            si.name.linesIterator.next().take(90), ms, si.numTasks,
            m.executorRunTime, m.executorDeserializeTime, m.jvmGCTime,
            m.resultSerializationTime,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    }

    // per-node SQL metrics of every root query executed in the timed
    // pass (the noop write + any eager child jobs): node name + the
    // interesting metrics, indented by tree depth — attributes the
    // anonymous AQE stages above to actual operators
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val sb = new StringBuilder
        sb.append(f"[plan] ---- $funcName ${durationNs / 1e9}%.2f s ----\n")
        def walk(p: org.apache.spark.sql.execution.SparkPlan,
            depth: Int): Unit = {
          val keep = p.metrics.filter { case (k, m) =>
            (k.contains("Time") || k.contains("time") ||
              k == "numOutputRows" || k.contains("bytes") ||
              k.contains("duration")) && m.value > 0
          }
          val ms = keep.map { case (k, m) => s"$k=${m.value}" }
            .mkString(", ")
          sb.append("[plan] " + ("  " * depth) + p.nodeName +
            (if (ms.nonEmpty) s"  [$ms]" else "") + "\n")
          val kids = p match {
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive
                .QueryStageExec => Seq(q.plan)
            case r: org.apache.spark.sql.execution
                .ReusedSubqueryExec => Seq(r.child)
            case _ => p.children
          }
          kids.foreach(walk(_, depth + 1))
        }
        walk(qe.executedPlan, 0)
        plans.synchronized { plans += sb.toString; () }
      }
      def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    val dumpPlans = sys.env.get("GRAFT_PROFILE_PLANS").contains("1")

    args.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up (codegen, footers)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      stages.clear()
      plans.clear()
      spark.sparkContext.addSparkListener(listener)
      if (dumpPlans) spark.listenerManager.register(qeListener)
      val t = once()
      Thread.sleep(300) // let the listener bus drain the final stage events
      spark.sparkContext.removeSparkListener(listener)
      if (dumpPlans) {
        spark.listenerManager.unregister(qeListener)
        Thread.sleep(200)
        plans.foreach(print)
      }
      println(f"[stages] ===== $n: $t%.2f s total, ${stages.size} stages =====")
      println(f"[stages] ${"id"}%4s ${"ms"}%7s ${"tasks"}%5s " +
        f"${"runMs"}%7s ${"deser"}%5s ${"gc"}%5s ${"rser"}%4s " +
        f"${"in MB"}%8s ${"sr MB"}%8s ${"sw MB"}%8s  name")
      stages.sortBy(_.id).foreach { s =>
        println(f"[stages] ${s.id}%4d ${s.ms}%7d ${s.tasks}%5d " +
          f"${s.runMs}%7d ${s.deserMs}%5d ${s.gcMs}%5d ${s.resMs}%4d " +
          f"${s.inputMB}%8.1f ${s.srMB}%8.1f ${s.swMB}%8.1f  ${s.name}")
      }
      val accounted = stages.map(_.ms).filter(_ > 0).sum / 1e3
      println(f"[stages] stage-accounted $accounted%.2f s of $t%.2f s wall " +
        "(gap = driver/planning/scheduling between stages)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
