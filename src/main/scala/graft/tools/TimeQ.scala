package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // leftover release between queries, like Bench.releaseLeftovers —
    // checkpointed RDD blocks from one query must not pressure the next
    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
    }
    args.foreach { n =>  // warm-up then min of 2, like Bench
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      release()
      once()
      val t = (1 to 2).map { _ => release(); System.gc(); once() }.min
      println(f"[timeq] $n%-22s $t%6.2f s")
    }
    spark.stop()
  }
}
