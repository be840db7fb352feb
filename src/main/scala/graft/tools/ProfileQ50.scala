package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Stage-level decomposition of q50 (CCNet-shape bigram-LM perplexity;
  * 3.12 on the r15 synced BENCH_SF1 curve — the ≥3 watchlist demands a
  * measured stage table, not a prose class). Stages mirror
  * [[graft.operators.NgramLm.perplexityProfile]]'s plan boundaries:
  * the tf build (token pass + pair explode + groupBy, localCheckpoint
  * pinned at call time), the c2/c1 model aggregations over the pinned
  * tf, the vocabulary pass (the second tokenization), and the scoring
  * join + per-doc DECIMAL sum. Results land in PLANS.md
  * "q50/q106 stage decompositions".
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ50"
  */
object ProfileQ50 {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleBench.generate(spark, base)

    def time[A](label: String)(f: => A): A = {
      f // warm-up
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[q50] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    for ((label, dir) <- Seq("sf0.1" -> base, "sf1" -> ScaleBench.OUT)) {
      println(s"[q50] ===== $label ($dir) =====")
      val docs = graft.Tables.parallel(spark, dir, "documents")
      val w = split(col("text"), " ")
      def pairsDf = docs
        .select(col("doc_id"), w.as("__w"),
          explode(when(size(w) >= 2, sequence(lit(1), size(w) - 1))
            .otherwise(array().cast("array<int>"))).as("__i"))
        .select(col("doc_id"),
          Hashes.xxhash64Seed0(element_at(col("__w"), col("__i")))
            .as("__hp"),
          Hashes.xxhash64Seed0(concat_ws(" ",
            element_at(col("__w"), col("__i")),
            element_at(col("__w"), col("__i") + 1))).as("__hb"))
      // stage 1: the tf build as the operator pins it (call-time job)
      val tf = time("tf build (pass+explode+groupBy+pin)")(
        pairsDf.groupBy(col("doc_id"), col("__hb"), col("__hp"))
          .agg(count(lit(1)).as("__tf"))
          .localCheckpoint())
      val nTf = tf.count()
      // stage 2: the two model aggregations over the PINNED tf
      time("c2+c1 model aggs (pinned tf)") {
        tf.groupBy("__hb").agg(sum(col("__tf"))).write
          .format("noop").mode("overwrite").save()
        tf.groupBy("__hp").agg(sum(col("__tf"))).write
          .format("noop").mode("overwrite").save()
      }
      // stage 3: the vocabulary pass (second tokenization of the corpus)
      val v = time("vocab pass (2nd tokenization)")(
        docs.select(explode(split(col("text"), " ")).as("__t"))
          .agg(countDistinct(Hashes.xxhash64Seed0(col("__t"))))
          .first().getLong(0))
      // stage 4: the scoring join + per-doc DECIMAL sum, over the same
      // pinned tf (isolates the join from the tf build)
      val c2 = tf.groupBy("__hb").agg(sum(col("__tf")).as("__c2"))
      val c1 = tf.groupBy("__hp").agg(sum(col("__tf")).as("__c1"))
      time("score join + per-doc sum") {
        tf.join(c2, "__hb").join(c1, "__hp")
          .withColumn("__s",
            (log((col("__c2").cast("double") + 1.0) /
              (col("__c1") + lit(v)).cast("double")) * col("__tf"))
              .cast("decimal(28,12)"))
          .groupBy("doc_id")
          .agg(sum(col("__s")).as("__nll"), sum(col("__tf")).as("__n"))
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[q50] tf rows=$nTf vocab=$v")
      tf.unpersist()
      time("FULL q50 (query+orderBy, noop sink)")(
        graft.SparkEntry.queries("q50_perplexity")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
