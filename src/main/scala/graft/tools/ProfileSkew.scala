package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Candidate-volume decomposition for the q114/q115 Zipf-hot skew
  * gates (r14 judge directive #1): measures, at sf0.1 and the
  * generated 10× sf1, what a frequency-blind gram-bucket join WOULD
  * expand (Σ df·(df−1)/2 — quadratic in the hot key's df) against
  * what the rare-first prefix blocking ACTUALLY expands, plus the hot
  * key's df and the final pair count. A healthy curve shows the naive
  * volume growing ~100× (quadratic on the hot gram) while the actual
  * candidate set grows ~10× (linear with data). Results land in
  * PLANS.md "Skew-adversary decomposition".
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileSkew"
  */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleBench.generate(spark, base)

    // the probes are part of what this tool demonstrates: capture them
    // (threshold lowered to the sf0.1 hot-df scale so both scales show
    // census behavior; the default 10k policy is a straggler alarm, not
    // a measurement dial)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    graft.functions.SkewWarn.threshold = 400L
    graft.functions.SkewWarn.sink = (tag, size, hits) => {
      events.add((tag, size))
      System.err.println(s"[skew-probe] $tag size=$size hits=$hits")
    }

    def time[A](label: String)(f: => A): A = {
      f // warm-up
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[skew] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    for ((label, dir) <- Seq("sf0.1" -> base, "sf1" -> ScaleBench.OUT)) {
      println(s"[skew] ===== $label ($dir) =====")
      graft.functions.SkewWarn.reset(); events.clear()

      // ---- q114 (Jaccard PPJoin) ----
      val t = 0.8 - 1e-9
      val docs = graft.queries.Round15.jaccardSkewDocs(spark, dir)
      val g = docs.select(col("doc_id").as("__id"),
        ColumnBridge.col(graft.functions.SortedGramHashes(
          ColumnBridge.expr(col("text")), 3)).as("__g"))
        .localCheckpoint() // pin: this tool re-reads the gram table ~6×
      val dfTable = g
        .select(explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
        .groupBy("__gram").agg(count(lit(1)).as("__df"))
      val stats = dfTable.agg(max("__df").as("mx"),
        sum(col("__df") * (col("__df") - 1) / 2).as("naive"),
        count(lit(1)).as("grams")).first()
      println(s"[skew] corpus rows=${docs.count()}  distinct grams=" +
        s"${stats.getLong(2)}  hottest df=${stats.getLong(0)}  " +
        s"naive all-gram pair volume=${stats.getDouble(1).toLong}")
      // r16: mirror the operator's auto sizing (full df>=2 coverage
      // under the default budget) instead of the removed fixed cap
      val df2 = dfTable.filter(col("__df") >= 2)
      val stopRows = df2
        .orderBy(col("__df").desc, col("__gram"))
        .limit(graft.operators.StopGrams.capFor(df2.count(),
          graft.operators.StopGrams.DefaultBudgetBytes)).collect()
      val byKey = stopRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val prefix = ColumnBridge.col(graft.functions.RarestPrefix(
        ColumnBridge.expr(col("__g")), t,
        graft.functions.RarestPrefix.broadcastTable(spark, byKey)))
      val buckets = g.select(col("__id"),
        size(col("__g")).cast("long").as("__n"),
        explode(when(col("__g").isNotNull, prefix)).as("__bucket"))
      val bstats = buckets.groupBy("__bucket").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"),
          sum(col("c") * (col("c") - 1) / 2).as("vol")).first()
      println(s"[skew] q114 prefix buckets: hottest=${bstats.getLong(0)}  " +
        s"in-bucket pair volume=${bstats.getDouble(1).toLong}")
      val pairsGen = ColumnBridge.col(graft.functions.LengthFilteredPairs(
        ColumnBridge.expr(col("__members")), t))
      val cands = buckets.groupBy("__bucket")
        .agg(collect_list(struct(col("__id"), col("__n"))).as("__members"))
        .filter(size(col("__members")) > 1)
        .select(pairsGen.as(Seq("id_a", "id_b")))
      println(s"[skew] q114 candidates: raw=${cands.count()}  " +
        s"distinct=${cands.distinct().count()}")
      val q114 = time("q114 full query")(
        graft.queries.Round15.q114JaccardSkew(spark, dir).count())
      println(s"[skew] q114 result pairs=$q114")

      // ---- q115 (containment) ----
      val ct = 0.9 - 1e-9
      val cdocs = graft.queries.Round15.containSkewDocs(spark, dir)
      val cg = cdocs.select(col("doc_id").as("__id"),
        ColumnBridge.col(graft.functions.SortedGramHashes(
          ColumnBridge.expr(col("text")), 3)).as("__g"))
        .localCheckpoint()
      val cdf = cg
        .select(explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
        .groupBy("__gram").agg(count(lit(1)).as("__df"))
      val cstats = cdf.agg(max("__df").as("mx"),
        sum((col("__df") * (col("__df") - 1)).cast("double"))
          .as("naive")).first()
      println(s"[skew] q115 corpus rows=${cdocs.count()}  hottest df=" +
        s"${cstats.getLong(0)}  naive directed volume=" +
        s"${cstats.getDouble(1).toLong}")
      val cdf2 = cdf.filter(col("__df") >= 2)
      val cstop = cdf2
        .orderBy(col("__df").desc, col("__gram"))
        .limit(graft.operators.StopGrams.capFor(cdf2.count(),
          graft.operators.StopGrams.DefaultBudgetBytes)).collect()
      val cByKey = cstop.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val cPrefix = ColumnBridge.col(graft.functions.RarestPrefix(
        ColumnBridge.expr(col("__g")), ct,
        graft.functions.RarestPrefix.broadcastTable(spark, cByKey)))
      val probe = cg.select(col("__id").as("id_a"),
        size(col("__g")).cast("long").as("__na"),
        explode(when(col("__g").isNotNull, cPrefix)).as("__gram"))
      val index = cg.select(col("__id").as("id_b"),
        size(col("__g")).cast("long").as("__nb"),
        explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
      println(s"[skew] q115 probe rows=${probe.count()}  " +
        s"index rows=${index.count()}")
      val joined = probe.join(index, "__gram")
        .filter(col("id_a") =!= col("id_b"))
      val lenOk = joined
        .filter(col("__nb").cast("double") >= col("__na") * ct)
      println(s"[skew] q115 joined rows=${joined.count()}  " +
        s"post length filter=${lenOk.count()}  distinct candidates=" +
        s"${lenOk.select("id_a", "id_b").distinct().count()}")
      val q115 = time("q115 full query")(
        graft.queries.Round15.q115ContainmentSkew(spark, dir).count())
      println(s"[skew] q115 result pairs=$q115")

      // ---- q116 (boilerplate-ONLY cohort; r15 judge directive #2) ----
      // The all-hot probe class: 5% of docs are nothing but the banner
      // (3 identical-body variants). Measures the containment
      // candidate volume — total and the cohort's own contribution
      // (probes with id >= 8M) — on the RAW corpus (each boilerplate
      // doc probes the full hot bucket: quadratic) vs after the
      // exact-collapse stage (each identical-body class probes once:
      // linear). A healthy curve: raw cohort candidates ~100× at 10×
      // data, collapsed cohort candidates ~10×.
      def contCandidates(docs: org.apache.spark.sql.DataFrame,
          tag: String): Unit = {
        val g2 = docs.select(col("doc_id").as("__id"),
          ColumnBridge.col(graft.functions.SortedGramHashes(
            ColumnBridge.expr(col("text")), 3)).as("__g"))
          .localCheckpoint()
        val dft = g2.select(explode(when(col("__g").isNotNull, col("__g")))
            .as("__gram"))
          .groupBy("__gram").agg(count(lit(1)).as("__df"))
          .filter(col("__df") >= 2)
        val stop = dft.orderBy(col("__df").desc, col("__gram"))
          .limit(graft.operators.StopGrams.capFor(dft.count(),
            graft.operators.StopGrams.DefaultBudgetBytes)).collect()
        val bk = stop.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val pfx = ColumnBridge.col(graft.functions.RarestPrefix(
          ColumnBridge.expr(col("__g")), ct,
          graft.functions.RarestPrefix.broadcastTable(spark, bk)))
        val pr = g2.select(col("__id").as("id_a"),
          size(col("__g")).cast("long").as("__na"),
          explode(when(col("__g").isNotNull, pfx)).as("__gram"))
        val ix = g2.select(col("__id").as("id_b"),
          size(col("__g")).cast("long").as("__nb"),
          explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
        val cands = pr.join(ix, "__gram")
          .filter(col("id_a") =!= col("id_b") &&
            col("__nb").cast("double") >= col("__na") * ct)
          .select("id_a", "id_b").distinct().localCheckpoint()
        println(s"[skew] q116 $tag: docs=${docs.count()}  candidates=" +
          s"${cands.count()}  cohort-probe candidates=" +
          s"${cands.filter(col("id_a") >= 8000000L).count()}")
      }
      val bdocs = graft.queries.Round16.boilerDocs(spark, dir)
      contCandidates(bdocs, "raw (no collapse)")
      contCandidates(graft.operators.DedupPipeline.collapseExact(
        bdocs, "doc_id", "text"), "collapsed")
      val q116 = time("q116 full query")(
        graft.queries.Round16.q116BoilerplateCollapse(spark, dir).count())
      println(s"[skew] q116 result pairs=$q116")

      // ---- bind×skew (r17 judge directive #1: q120/q121) ----
      // The 100 TB path under the Zipf-hot plant: the stop table has
      // outgrown the driver budget, so the prefix order is computed
      // DISTRIBUTED (StopGrams.joinPrefix) — a gram-keyed (doc-gram ×
      // df-table) join that hash-routes every doc holding a hot gram
      // to one partition. This section measures (a) that join's
      // per-partition balance AS EXECUTED (hottest vs median partition
      // row count, and whether AQE's skew/coalesce reader fired), and
      // (b) bind-path candidate volume at both scales — the 10× curve
      // the q120 gate's linearity claim rests on.
      val bindT = t // q120 = q114's threshold through the bind
      val dft114 = dfTable.filter(col("__df") >= 2).localCheckpoint()
      val bindJoin = g.select(
          col("__id"), size(col("__g")).cast("long").as("__n"),
          explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
        .join(dft114, Seq("__gram"), "left")
      val bindParts = bindJoin
        .groupBy(spark_partition_id().as("__pid"))
        .agg(count(lit(1)).as("c"))
      val partRows = bindParts.collect().map(_.getLong(1)).sorted
      val aqeRead = bindParts.queryExecution.executedPlan.toString()
      val aqeMech =
        if (aqeRead.contains("skewed")) "AQE skew-split fired"
        else if (aqeRead.contains("coalesced")) "AQE coalesced (no skew split needed)"
        else "plain hash partitions (no AQE rewrite)"
      println(s"[skew] q120 gram-df join partitions: n=${partRows.length}  " +
        s"hottest=${partRows.last}  median=${partRows(partRows.length / 2)}  " +
        s"hot/median=${"%.2f".format(
          partRows.last.toDouble / math.max(partRows(partRows.length / 2), 1))}  " +
        s"[$aqeMech]")
      val bindBuckets = graft.operators.StopGrams.joinPrefix(g, dft114, bindT)
        .select(col("__id"), col("__n"), col("__gram").as("__bucket"))
      val bindPairsGen = ColumnBridge.col(graft.functions.LengthFilteredPairs(
        ColumnBridge.expr(col("__members")), bindT))
      val bindCands = bindBuckets.groupBy("__bucket")
        .agg(collect_list(struct(col("__id"), col("__n"))).as("__members"))
        .filter(size(col("__members")) > 1)
        .select(bindPairsGen.as(Seq("id_a", "id_b")))
      println(s"[skew] q120 bind candidates: raw=${bindCands.count()}  " +
        s"distinct=${bindCands.distinct().count()}")
      val q120 = time("q120 full query")(
        graft.queries.Round18.q120JaccardBindSkew(spark, dir).count())
      println(s"[skew] q120 result pairs=$q120")
      // containment twin: probe prefix via joinPrefix, full-gram index
      val cdft = cdf.filter(col("__df") >= 2).localCheckpoint()
      val bindProbe = graft.operators.StopGrams.joinPrefix(cg, cdft, ct)
        .select(col("__id").as("id_a"), col("__n").as("__na"), col("__gram"))
      val bindIndex = cg.select(col("__id").as("id_b"),
        size(col("__g")).cast("long").as("__nb"),
        explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
      val bindCCands = bindProbe.join(bindIndex, "__gram")
        .filter(col("id_a") =!= col("id_b") &&
          col("__nb").cast("double") >= col("__na") * ct)
        .select("id_a", "id_b").distinct()
      println(s"[skew] q121 bind candidates: distinct=${bindCCands.count()}")
      val q121 = time("q121 full query")(
        graft.queries.Round18.q121ContainmentBindSkew(spark, dir).count())
      println(s"[skew] q121 result pairs=$q121")
      import scala.jdk.CollectionConverters._
      val fired = events.asScala.toSeq
      println(s"[skew] probes fired at $label: " +
        (if (fired.isEmpty) "none"
         else fired.groupBy(_._1).map { case (tag, xs) =>
           s"$tag(max=${xs.map(_._2).max})" }.mkString(", ")))
    }
    spark.stop()
  }
}
