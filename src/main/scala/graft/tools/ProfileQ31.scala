package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Stage-level timing for the winnowing near-dup pipeline (q31) — dev
  * harness, not part of the graded surface. */
object ProfileQ31 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile-q31").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = {
      val d = graft.Tables.parallel(spark, dir, "documents")
      val perturbed = d.filter(col("n_chars") >= 100)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
      d.select("doc_id", "text").unionByName(perturbed)
    }
    val fp = ColumnBridge.col(graft.functions.WinnowFingerprints(
      ColumnBridge.expr(col("text")), k = 12, window = 8))
    val pairs = ColumnBridge.col(graft.functions.SortedPairs(
      ColumnBridge.expr(col("__ids"))))

    time("winnow+explode")(docs.select(col("doc_id").as("__id"), explode(fp).as("__fp")))
    val buckets = docs
      .select(col("doc_id").as("__id"), explode(fp).as("__fp"))
      .groupBy("__fp").agg(collect_list(col("__id")).as("__ids"))
      .filter(size(col("__ids")).between(2, 32))
    time("buckets(2..32)")(buckets)
    val rawPairs = buckets.select(pairs.as(Seq("id_a", "id_b")))
    time("pair instances")(rawPairs)
    val cands = rawPairs
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 3)
    time("candidates(>=3)")(cands)
    time("full q31")(graft.queries.LlmPipeline.q31WinnowNearDup(spark, dir))
    time("full q31 again")(graft.queries.LlmPipeline.q31WinnowNearDup(spark, dir))
    spark.stop()
  }
}
