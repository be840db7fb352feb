package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named SparkEntry queries — dev
  * harness for the plan audits recorded in PLANS.md. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // graft.Sessions (not a bare builder): events.parquet needs the
    // nanosAsLong conf at session-build time or the scan throws
    // PARQUET_TYPE_ILLEGAL
    val spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"========== $name ==========")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
