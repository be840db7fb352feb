package graft.tools

import org.apache.spark.sql.functions._

/** Duplicated-subtree audit for q51 (incremental dedup probe; the
  * third-heaviest bench row at sf0.1). In
  * [[graft.operators.IncrementalDedup.dedupNew]] the `exact` aggregate
  * is reachable through three references (two `survivors` uses + the
  * final verdict join), so the probe may pay the index fp-join several
  * times per evaluation. Measures: the exact join alone, the full
  * query as shipped, and the full query with an eager pin injected on
  * the exact aggregate — if the pinned variant is materially faster,
  * the pin belongs in the operator (the q113/q75 lesson: measure the
  * duplication, don't reason about it).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ51"
  */
object ProfileQ51 {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String, reps: Int = 2)(f: => A): Double = {
      f // warm-up
      val best = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q51] $label%-44s $best%7.2f s")
      best
    }

    for ((label, dir) <- Seq("sf0.1" -> base)) {
      println(s"[q51] ===== $label ($dir) =====")
      time("FULL q51 as shipped")(
        graft.SparkEntry.queries("q51_incremental_dedup")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      // job-count audit: how many jobs does one evaluation run?
      val sc = spark.sparkContext
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      graft.SparkEntry.queries("q51_incremental_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(s"[q51] jobs per evaluation: " +
        s"${sc.statusTracker.getJobIdsForGroup(null).length - before}")
    }
    spark.stop()
  }
}
