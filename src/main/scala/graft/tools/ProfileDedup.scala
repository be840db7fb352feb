package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge
import graft.operators.{ClusterDedup, MinHashLsh}

/** Stage-level timing of the shared dedup DAG (q38/q41/q46 cost center):
  * exact stage → signature/buckets/pairs → verify join → connected
  * components → verdict join, each materialized to count() after a
  * warm-up pass. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      f // warm-up
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // q38's corpus: documents ∪ perturbed (+1M) ∪ verbatim (+2M)
    val base = graft.Tables.parallel(spark, dir, "documents")
    val docs = base.select(col("doc_id"), col("text"))
      .unionByName(base.filter(col("n_chars") >= 100).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
      .unionByName(base.filter(col("n_chars") >= 100).select(
        (col("doc_id") + 2000000L).as("doc_id"), col("text")))
    time("corpus scan")(docs.count())

    // the PRODUCT collapse stage (DedupPipeline.collapseExact — the one
    // shared implementation; this tool must profile the shipped plan,
    // not a drifted replica), timed as one stage: the call is eager
    // (groupBy-fp shuffle + localCheckpoint materialization together)
    val repsCk = time("exact collapse (fp group + ckpt)")(
      graft.operators.DedupPipeline.collapseExact(docs, "doc_id", "text"))

    val sig = ColumnBridge.col(graft.functions.MinHashTextSignature(
      ColumnBridge.expr(col("text")), 3, 64))
    val buckets = MinHashLsh.bandBuckets(repsCk, col("doc_id"), sig, 64, 32)
    time("signature+buckets")(buckets.count())
    val cands = MinHashLsh.candidatePairs(buckets)
    time("buckets+cand pairs")(cands.count())

    val pairs = MinHashLsh.nearDupPairs(repsCk, "doc_id", "text", 3, 64, 32, 0.8)
    time("pairs incl verify join")(pairs.count())
    val pairsCk = pairs.select("id_a", "id_b").localCheckpoint()

    time("connected components")(ClusterDedup.clusterReps(pairsCk).count())

    time("full corpusVerdict")(
      graft.operators.DedupPipeline.corpusVerdict(docs, "doc_id", "text").count())

    spark.stop()
  }
}
