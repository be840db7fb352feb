package graft

/** Plan-audit tool: prints `explain("formatted")` for every registered
  * query (or the names given as args) so scan pruning (`ReadSchema`,
  * `PushedFilters`), join strategies, partial aggregation, and
  * whole-stage-codegen spans can be reviewed against the 100 TB plan
  * shape. PLANS.md holds the curated audit.
  *
  * Usage: runMain graft.PlanAudit [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
