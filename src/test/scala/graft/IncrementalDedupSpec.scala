package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup

/** Incremental-dedup semantics: exact-by-normalized-fingerprint, near by
  * verified shingle Jaccard against the persisted index, exact-wins
  * precedence, the every-new-doc-reports contract, and the
  * self-describing index parameters.
  */
class IncrementalDedupSpec extends SparkSuite {

  import spark.implicits._

  private val history = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "completely different content words here banana",
    3L -> "short").toDF("doc_id", "text")

  test("verdicts: exact, normalized exact, near, new, shingle-less new") {
    val dir = java.nio.file.Files
      .createTempDirectory("inc_dedup_spec").toString
    IncrementalDedup.writeIndex(history, "doc_id", "text", dir)
    val newDocs = Seq(
      11L -> "the quick brown fox jumps over the lazy dog", // verbatim
      12L -> "The quick brown fox jumps over the lazy DOG  ", // case/trim
      13L -> "quick brown fox jumps over the lazy dog", // J = 6/7 near
      14L -> "entirely novel sentence about unrelated topics today",
      15L -> "short", // exact match of a short doc
      16L -> "xy" // < k words: no shingles, must come out new
    ).toDF("doc_id", "text")
    val got = IncrementalDedup
      .dedupNew(spark, newDocs, history, "doc_id", "text", dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (11L, "exact", 1L),
      (12L, "exact", 1L),
      (13L, "near", 1L),
      (14L, "new", 0L),
      (15L, "exact", 1L),
      (16L, "new", 0L)))
  }

  test("probe honors the index's own parameters, not caller defaults") {
    val dir = java.nio.file.Files
      .createTempDirectory("inc_dedup_spec2").toString
    // non-default signature shape: a probe that assumed 64/32 would
    // compute different band keys and find nothing
    IncrementalDedup.writeIndex(history, "doc_id", "text", dir,
      shingleK = 2, numHashes = 16, bands = 8)
    val newDocs = Seq(
      21L -> "quick brown fox jumps over the lazy dog").toDF("doc_id", "text")
    val got = IncrementalDedup
      .dedupNew(spark, newDocs, history, "doc_id", "text", dir,
        minJaccard = 0.7)
      .head()
    assert(got.getString(1) === "near")
  }

  test("bloom pre-probe changes no verdict (and the index carries it)") {
    val dir = java.nio.file.Files
      .createTempDirectory("inc_dedup_spec3").toString
    IncrementalDedup.writeIndex(history, "doc_id", "text", dir)
    assert(new java.io.File(s"$dir/bloom").exists(), "bloom sidecar missing")
    val rnd = new scala.util.Random(5)
    // mostly-new batch (the deployment shape the bloom exists for) plus
    // planted exact/near copies
    val newDocs = ((1 to 40).map { i =>
      (100L + i) -> s"novel content ${rnd.nextInt(1000)} batch item $i words"
    } ++ Seq(
      201L -> "the quick brown fox jumps over the lazy dog",
      202L -> "quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    def run() = IncrementalDedup
      .dedupNew(spark, newDocs, history, "doc_id", "text", dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val withBloom = run()
    // removing the sidecar must yield bit-identical verdicts (the bloom
    // is a pure pre-filter: false => definitely absent, true => settled
    // by the exact join)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$dir/bloom"))
    assert(run() === withBloom)
    assert(withBloom.count(_._2 == "exact") === 1)
    assert(withBloom.count(_._2 == "near") === 1)
    assert(withBloom.count(_._2 == "new") === 40)
  }

  test("appendToIndex == from-scratch rebuild on the union (daily loop)") {
    val day1 = history
    val day2 = Seq(
      31L -> "fresh day two document with brand new material inside",
      32L -> "another accepted crawl document full of other words").toDF("doc_id", "text")
    val probes = Seq(
      41L -> "fresh day two document with brand new material inside", // exact vs day2
      42L -> "day two document with brand new material inside", // near vs day2
      43L -> "the quick brown fox jumps over the lazy dog", // exact vs day1
      44L -> "totally unrelated probe sentence appears here now").toDF("doc_id", "text")
    // maintained index: write day1, append day2 (non-default params so
    // append must honor the index's own meta, not defaults)
    val dirA = java.nio.file.Files
      .createTempDirectory("inc_dedup_append").toString
    IncrementalDedup.writeIndex(day1, "doc_id", "text", dirA,
      shingleK = 2, numHashes = 32, bands = 16)
    IncrementalDedup.appendToIndex(day2, "doc_id", "text", dirA)
    // reference index: built from scratch over day1 ∪ day2
    val dirB = java.nio.file.Files
      .createTempDirectory("inc_dedup_scratch").toString
    IncrementalDedup.writeIndex(day1.unionByName(day2), "doc_id", "text",
      dirB, shingleK = 2, numHashes = 32, bands = 16)
    val full = day1.unionByName(day2)
    def verdicts(dir: String) = IncrementalDedup
      .dedupNew(spark, probes, full, "doc_id", "text", dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val a = verdicts(dirA)
    assert(a === verdicts(dirB))
    assert(a.map(v => v._1 -> v._2).toMap ===
      Map(41L -> "exact", 42L -> "near", 43L -> "exact", 44L -> "new"))
  }

  test("bucketed index (format 3, r17 directive #4): identical verdicts " +
      "to a plain index, NO Exchange above either history-side scan, " +
      "both scans bucket-partitioned, registration survives a catalog " +
      "wipe") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val dirB = java.nio.file.Files
      .createTempDirectory("inc_dedup_bucketed").toString
    val dirP = java.nio.file.Files
      .createTempDirectory("inc_dedup_plainidx").toString
    IncrementalDedup.writeIndex(history, "doc_id", "text", dirB) // 32 buckets
    IncrementalDedup.writeIndex(history, "doc_id", "text", dirP,
      numBuckets = 0) // the plain A/B twin
    val newDocs = Seq(
      61L -> "the quick brown fox jumps over the lazy dog", // exact
      62L -> "quick brown fox jumps over the lazy dog", // near
      63L -> "entirely novel sentence about unrelated topics today"
    ).toDF("doc_id", "text")
    def verdicts(dir: String) = IncrementalDedup
      .dedupNew(spark, newDocs, history, "doc_id", "text", dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val bucketed = verdicts(dirB)
    assert(bucketed === verdicts(dirP),
      "bucketing is a plan-shape property; verdicts must be identical")
    assert(bucketed.map(v => v._1 -> v._2).toMap ===
      Map(61L -> "exact", 62L -> "near", 63L -> "new"))

    // plan shape, deterministically (static planner, no broadcast —
    // at real index scale the history side is never broadcastable, so
    // the spec pins the shuffle-join shape the claim is about)
    val restore = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def indexScans(dir: String,
          plan: org.apache.spark.sql.execution.SparkPlan) =
        plan.collect {
          case s: FileSourceScanExec if s.relation.location.rootPaths
            .exists(_.toString.contains(
              new java.io.File(dir).getName)) => s
        }
      // THE claim, precisely: no Exchange sits BETWEEN a history-side
      // index scan and the join that consumes it. Exchanges downstream
      // of that join (aggregates on the join output etc.) contain the
      // scan deep in their subtree and are the probe's own, legitimate
      // batch-sized shuffles — a join node "consumes" the scan, so the
      // exposure walk stops there.
      def historyExchanges(dir: String,
          plan: org.apache.spark.sql.execution.SparkPlan) = {
        def isIdxScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          p match {
            case s: FileSourceScanExec => s.relation.location.rootPaths
              .exists(_.toString.contains(new java.io.File(dir).getName))
            case _ => false
          }
        def exposed(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          isIdxScan(p) ||
            (!p.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec] &&
              p.children.exists(exposed))
        plan.collect {
          case e: ShuffleExchangeExec if exposed(e.child) => e
        }
      }
      def probePlan(dir: String) = {
        val df = IncrementalDedup.dedupNew(
          spark, newDocs, history, "doc_id", "text", dir)
        df.queryExecution.executedPlan
      }
      val planB = probePlan(dirB)
      val scansB = indexScans(dirB, planB)
      // the exact fps subtree is referenced three times and bands once,
      // so several scan instances appear; every one must be bucketed
      assert(scansB.nonEmpty, "no index scans found in the probe plan")
      scansB.foreach { s =>
        assert(s.outputPartitioning match {
          case h: HashPartitioning => h.numPartitions === 32
          case _ => false
        }, s"index scan not bucket-partitioned: ${s.nodeName} " +
          s"${s.outputPartitioning}")
      }
      val exchangesOverIndex = historyExchanges(dirB, planB)
      assert(exchangesOverIndex.isEmpty,
        s"history-side Exchange in the bucketed probe plan:\n" +
          exchangesOverIndex.mkString("\n"))
      // contrast: the plain index pays exchanges over its scans
      val planP = probePlan(dirP)
      assert(historyExchanges(dirP, planP).nonEmpty,
        "plain index probe unexpectedly exchange-free - the " +
          "bucketed claim would be vacuous")

      // fresh-session shape: wipe the catalog entries; the probe must
      // re-register from the index's own meta + footprint and KEEP the
      // bucketed plan (nothing session-local is load-bearing)
      Seq("fps", "bands").foreach { sub =>
        spark.sql(
          s"DROP TABLE IF EXISTS ${IncrementalDedup.tableName(dirB, sub)}")
      }
      assert(verdicts(dirB) === bucketed)
      assert(historyExchanges(dirB, probePlan(dirB)).isEmpty,
        "re-registered index lost its bucketed plan")
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("format-1 index fails LOUDLY (r16 directive #1 version bump)") {
    // a pre-r17 index (64-bit fps, meta without `format`) must raise a
    // clear rebuild error from BOTH the probe and the append path — a
    // silent read would miss every exact match (disjoint join keys)
    val dir = java.nio.file.Files
      .createTempDirectory("inc_dedup_fmt").toString
    IncrementalDedup.writeIndex(history, "doc_id", "text", dir)
    // overwrite meta in the old (format-less) layout
    Seq((3, 64, 32)).toDF("shingle_k", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val newDocs = Seq(51L -> "anything at all").toDF("doc_id", "text")
    val eProbe = intercept[IllegalStateException] {
      IncrementalDedup.dedupNew(spark, newDocs, history,
        "doc_id", "text", dir)
    }
    assert(eProbe.getMessage.contains("rebuild"))
    val eAppend = intercept[IllegalStateException] {
      IncrementalDedup.appendToIndex(newDocs, "doc_id", "text", dir)
    }
    assert(eAppend.getMessage.contains("rebuild"))
    // an explicit future format number is rejected too
    Seq((99, 3, 64, 32)).toDF("format", "shingle_k", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val eVer = intercept[IllegalStateException] {
      IncrementalDedup.dedupNew(spark, newDocs, history,
        "doc_id", "text", dir)
    }
    assert(eVer.getMessage.contains("format 99"))
  }
}
