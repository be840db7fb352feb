package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Stage-level decomposition of q59 (the asymmetric containment
  * self-join; r14 judge directive #2: the last ≥3 BENCH_SF1 row whose
  * work-linear verdict rested on prose — and q75's prose verdict hid a
  * real GC defect). Stages mirror
  * [[graft.operators.ContainmentJoin.containedPairs]]'s plan
  * boundaries: the stop-gram df job (one full gram pass + groupBy +
  * capped sort-collect), the probe/index gram explodes, the bucket
  * join + length filter + distinct (candidates), and the text-join
  * verify. Results land in PLANS.md "q59 stage decomposition".
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ59"
  */
object ProfileQ59 {
  def main(args: Array[String]): Unit = {
    // optional arg: stop-gram cap override (default -1 = the
    // operator's auto sizing, full df>=2 coverage under the budget) —
    // passing 65536 reproduces the r15 fixed-cap super-linearity A/B
    val capArg = if (args.nonEmpty) args(0).toInt else graft.operators.StopGrams.Auto
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
      println(f"[q59] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    for ((label, dir) <- Seq("sf0.1" -> base, "sf1" -> ScaleBench.OUT)) {
      println(s"[q59] ===== $label ($dir) =====")
      val t = 0.9 - 1e-9
      val docs = graft.queries.CorpusExtras.snippetCorpus(spark, dir)
      val nDocs = docs.count()
      val grams = ColumnBridge.col(graft.functions.SortedGramHashes(
        ColumnBridge.expr(col("text")), 3))
      val g = docs.select(col("doc_id").as("__id"), grams.as("__g"))

      // stage 1: the raw gram pass alone (scan + fused hash, no agg)
      time("gram pass (scan+hash only)")(
        g.select(sum(size(col("__g")))).first())
      // stage 2: the stop-gram df job as the operator runs it (r16:
      // ONE budget-bounded collect; shorter-than-bound = full
      // coverage, no count job)
      val dfT = g.select(explode(when(col("__g").isNotNull, col("__g")))
          .as("__gram"))
        .groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= 2)
        .persist()
      val cap = graft.operators.StopGrams.collectBound(capArg,
        graft.operators.StopGrams.DefaultBudgetBytes)
      val stopRows = time("stop-gram df job (pass+groupBy)") {
        dfT.orderBy(col("__df").desc, col("__gram")).limit(cap).collect()
      }
      println(s"[q59] df>=2 grams collected=${stopRows.length} bound=$cap" +
        (if (stopRows.length == cap) "  (POSSIBLY TRUNCATED)"
         else "  (full coverage)"))
      dfT.unpersist()
      val byKey = stopRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val prefix = ColumnBridge.col(graft.functions.RarestPrefix(
        ColumnBridge.expr(col("__g")), t,
        graft.functions.RarestPrefix.broadcastTable(spark, byKey)))
      val probe = g.select(col("__id").as("id_a"),
        size(col("__g")).cast("long").as("__na"),
        explode(when(col("__g").isNotNull, prefix)).as("__gram"))
      val index = g.select(col("__id").as("id_b"),
        size(col("__g")).cast("long").as("__nb"),
        explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
      // stage 3a/3b: each explode side alone (both re-run the gram pass
      // — the operator's documented recompute-over-materialize choice)
      val probeRows = time("probe explode (prefix side)")(probe.count())
      val indexRows = time("index explode (full side)")(index.count())
      // stage 4: bucket join + length filter + distinct candidates
      val cands = probe.join(index, "__gram")
        .filter(col("id_a") =!= col("id_b") &&
          col("__nb").cast("double") >= col("__na") * t)
        .select("id_a", "id_b")
        .distinct()
      val nCands = time("bucket join + filter + distinct")(cands.count())
      // stage 5: the verify join over pinned candidates (isolates the
      // text join + ShingleContainment from the candidate job)
      val pinned = cands.localCheckpoint()
      val rawA = docs.select(col("doc_id").as("id_a"),
        col("text").as("__t_a"))
      val rawB = docs.select(col("doc_id").as("id_b"),
        col("text").as("__t_b"))
      val nPart = spark.sessionState.conf.numShufflePartitions
      val nOut = time("verify (text join + containment)")(
        pinned.repartition(nPart)
          .join(rawA, "id_a").join(rawB, "id_b")
          .select(col("id_a"), col("id_b"),
            ColumnBridge.col(graft.functions.ShingleContainment(
              ColumnBridge.expr(col("__t_a")),
              ColumnBridge.expr(col("__t_b")), 3)).as("containment"))
          .filter(col("containment") >= 0.9)
          .count())
      println(s"[q59] docs=$nDocs probeRows=$probeRows " +
        s"indexRows=$indexRows candidates=$nCands out=$nOut")
      time("FULL q59 (query+orderBy, noop sink)")(
        graft.SparkEntry.queries("q59_containment_dedup")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
