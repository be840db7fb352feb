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

  test("catalog names are collision-proof across lossy-sanitizing paths " +
      "and a stale registration is detected and re-derived (r18 ADVICE)") {
    val root = java.nio.file.Files
      .createTempDirectory("inc_dedup_collide").toString
    // two DISTINCT index paths whose sanitized names would collide
    // ('-' and '_' both sanitize to '_'): pre-digest, the second probe
    // silently read the FIRST index's files through the shared entry
    val pathA = s"$root/idx-1"
    val pathB = s"$root/idx_1"
    assert(IncrementalDedup.tableName(pathA, "fps") !==
      IncrementalDedup.tableName(pathB, "fps"))
    val histA = history // knows the fox doc
    val histB = Seq(2L -> "completely different content words here banana")
      .toDF("doc_id", "text") // does NOT know the fox doc
    IncrementalDedup.writeIndex(histA, "doc_id", "text", pathA)
    IncrementalDedup.writeIndex(histB, "doc_id", "text", pathB)
    val probe = Seq(71L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    def verdictAgainst(dir: String, hist: org.apache.spark.sql.DataFrame) =
      IncrementalDedup.dedupNew(spark, probe, hist, "doc_id", "text", dir)
        .head().getString(1)
    // same session, both indexes probed: each must answer from its OWN
    // files (a shared catalog name would make these agree)
    assert(verdictAgainst(pathA, histA) === "exact")
    assert(verdictAgainst(pathB, histB) === "new")

    // stale-registration detection: hand the session a catalog entry
    // whose LOCATION points at the OTHER index (the pre-digest failure
    // mode, and the cross-session analog of any stale cache) and one
    // whose BUCKET COUNT contradicts the index's own meta. readTable
    // must drop and re-register from ground truth, not trust it.
    Seq("fps", "bands").foreach { sub =>
      val name = IncrementalDedup.tableName(pathB, sub)
      val keys = sub match {
        case "fps" => "fp_lo, fp_hi"; case _ => "band, bucket" }
      val schema = spark.read.parquet(s"$pathB/$sub").schema.toDDL
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // wrong location (index A's files) AND wrong bucket count
      spark.sql(s"CREATE TABLE $name ($schema) USING PARQUET " +
        s"CLUSTERED BY ($keys) SORTED BY ($keys) INTO 8 BUCKETS " +
        s"LOCATION '$pathA/$sub'")
    }
    assert(verdictAgainst(pathB, histB) === "new",
      "a stale catalog entry (wrong location/buckets) must be dropped " +
        "and re-registered from the index's own meta, not trusted")
    // and the re-derived registration carries the TRUE location + spec
    val fixed = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        IncrementalDedup.tableName(pathB, "fps")))
    assert(fixed.bucketSpec.exists(_.numBuckets === 32))
    assert(new java.io.File(fixed.location).getCanonicalPath ===
      new java.io.File(s"$pathB/fps").getCanonicalPath)
  }

  test("compactIndex (r18 directive #2): post-append probe keeps zero " +
      "history-side Exchange but re-gains the index-side sort; compact " +
      "restores one file per bucket and the sort-free plan; verdicts " +
      "unchanged throughout") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val dir = java.nio.file.Files
      .createTempDirectory("inc_dedup_compact").toString
    IncrementalDedup.writeIndex(history, "doc_id", "text", dir)
    // three daily appends -> each bucket that receives rows gains a
    // file per append; Spark then distrusts the bucket-sort metadata.
    // day3 re-appends day2's exact text under a new id: identical text
    // -> identical fingerprint and band keys -> the SAME buckets,
    // which makes the multi-file-bucket shape DETERMINISTIC (distinct
    // texts hashing into 32 buckets might not collide)
    val day2 = Seq(31L -> "fresh day two document with brand new material inside")
      .toDF("doc_id", "text")
    val day3 = Seq(
      32L -> "another accepted crawl document full of other words",
      34L -> "fresh day two document with brand new material inside")
      .toDF("doc_id", "text")
    val day4 = Seq(33L -> "yet one more accepted daily crawl document arrives")
      .toDF("doc_id", "text")
    Seq(day2, day3, day4).foreach(
      IncrementalDedup.appendToIndex(_, "doc_id", "text", dir))
    val full = history.unionByName(day2).unionByName(day3).unionByName(day4)
    val probe = Seq(
      81L -> "the quick brown fox jumps over the lazy dog", // exact, day1
      82L -> "fresh day two document with brand new material inside", // exact, appended
      83L -> "quick brown fox jumps over the lazy dog", // near
      84L -> "wholly unrelated probe sentence appears right here"
    ).toDF("doc_id", "text")
    def verdicts() = IncrementalDedup
      .dedupNew(spark, probe, full, "doc_id", "text", dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val before = verdicts()
    assert(before === Seq(81L -> "exact", 82L -> "exact",
      83L -> "near", 84L -> "new"))

    def filesPerBucket(sub: String): Map[String, Int] =
      new java.io.File(s"$dir/$sub").listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          !f.getName.endsWith(".crc"))
        // bucket id is the _00000 suffix field of the part file name
        .groupBy(_.getName.split("_").last.take(5)).map {
          case (b, fs) => b -> fs.length }
    assert(filesPerBucket("fps").values.exists(_ > 1),
      "appends should have left multi-file buckets (else the compact " +
        "claim is vacuous)")

    // deterministic plan shape: static planner, no broadcast (the
    // at-scale shape — history is never broadcastable)
    val restore = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val baseName = new java.io.File(dir).getName
      def isIdxScan(p: SparkPlan): Boolean = p match {
        case s: FileSourceScanExec => s.relation.location.rootPaths
          .exists(_.toString.contains(baseName))
        case _ => false
      }
      // exposure walk (the IncrementalDedupSpec convention): a node
      // sits between an index scan and the join consuming it iff the
      // scan is reachable without crossing a join node
      def exposed(p: SparkPlan): Boolean =
        isIdxScan(p) ||
          (!p.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec] &&
            p.children.exists(exposed))
      def plan() = IncrementalDedup
        .dedupNew(spark, probe, full, "doc_id", "text", dir)
        .queryExecution.executedPlan
      def historyExchanges(p: SparkPlan) =
        p.collect { case e: ShuffleExchangeExec if exposed(e.child) => e }
      def historySorts(p: SparkPlan) =
        p.collect { case s: SortExec if exposed(s.child) => s }

      // post-append: the bucket metadata still satisfies the join's
      // required DISTRIBUTION (zero history-side Exchange — the
      // headline claim holds through appends), but multi-file buckets
      // lose the recorded sort ORDER, so the SMJ re-gains its
      // index-side SortExec — stated honestly, that is what
      // compactIndex exists to remove
      val planAppended = plan()
      assert(historyExchanges(planAppended).isEmpty,
        "appends must never re-introduce a history-side Exchange")
      assert(historySorts(planAppended).nonEmpty,
        "multi-file buckets should have re-gained the index-side sort " +
          "(else compaction buys nothing and the spec is vacuous)")

      IncrementalDedup.compactIndex(spark, dir)
      Seq("fps", "bands").foreach { sub =>
        val fpb = filesPerBucket(sub)
        assert(fpb.values.forall(_ === 1),
          s"$sub not one-file-per-bucket after compact: $fpb")
      }
      assert(verdicts() === before,
        "compaction is a file-layout rewrite; verdicts must not change")
      val planCompacted = plan()
      assert(historyExchanges(planCompacted).isEmpty,
        "compacted probe must stay history-Exchange-free")
      assert(historySorts(planCompacted).isEmpty,
        "one file per bucket restores the recorded sort order; the " +
          "index-side SortExec must be gone")
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
