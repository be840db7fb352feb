package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed-index probe stamp at sf1 (r17 judge directive #4): builds
  * the [[graft.operators.IncrementalDedup]] index over the 10× corpus
  * TWICE — format-3 bucketed (the default) and plain parquet
  * (`numBuckets = 0`) — and times the daily probe against each, plus a
  * plan audit counting Exchange nodes above the history-side scans.
  * The claim under test: bucketing the fps/bands tables by their
  * probe-join keys removes every history-side shuffle, so the probe's
  * shuffle volume is the DAY'S BATCH, not the index — the property
  * that makes the operator viable when history is petabyte-class.
  * Results land in PLANS.md "Incremental-probe bucketed index"; the
  * plan shape itself is spec-pinned (IncrementalDedupSpec).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileIncremental"
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleBench.generate(spark, base)

    def time[A](label: String, reps: Int = 2)(f: => A): Double = {
      f // warm-up
      val best = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[incprobe] $label%-40s $best%7.2f s")
      best
    }

    for ((label, dir) <- Seq("sf0.1" -> base, "sf1" -> ScaleBench.OUT)) {
      println(s"[incprobe] ===== $label ($dir) =====")
      val docs = graft.Tables.parallel(spark, dir, "documents")
      val hist = docs.select(col("doc_id"), col("text")).localCheckpoint()
      // q51's daily-batch shape: perturbed (near), verbatim (exact),
      // word-reversed (new) copies of the long docs
      val long = docs.filter(col("n_chars") >= 100)
      val newBatch = long
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
        .unionByName(long.select((col("doc_id") + 2000000L).as("doc_id"),
          col("text")))
        .unionByName(long.select((col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
        .localCheckpoint()

      def probeOf(path: String): DataFrame = graft.operators.IncrementalDedup
        .dedupNew(spark, newBatch, hist, "doc_id", "text", path)
      // count exchanges BETWEEN an index scan and the join consuming it
      // (a join "consumes" the scan, so the walk stops there — exchanges
      // downstream of the join are the probe's own batch-sized shuffles;
      // the same exposure walk IncrementalDedupSpec pins)
      def indexExchanges(path: String, df: DataFrame): Int = {
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        val baseName = new java.io.File(path).getName
        def isIdxScan(p: SparkPlan): Boolean = p match {
          case s: FileSourceScanExec => s.relation.location.rootPaths
            .exists(_.toString.contains(baseName))
          case _ => false
        }
        def exposed(p: SparkPlan): Boolean =
          isIdxScan(p) ||
            (!p.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec] &&
              p.children.exists(exposed))
        df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec if exposed(e.child) => e
        }.length
      }

      // r18 judge directive #2: the MAINTAINED-index shape — 30 daily
      // appends leave ~31 files per bucket, so the probe's SMJ re-gains
      // its index-side sort (the bucket DISTRIBUTION survives appends —
      // zero history-side Exchange throughout, spec-pinned — but Spark
      // only trusts the recorded bucket SORT when each bucket holds one
      // file); compactIndex rewrites one file per bucket and restores
      // the sort-free plan. Stamp: probe after 30 appends vs probe
      // after compact, plus what the compaction itself costs.
      locally {
        val path = java.nio.file.Files
          .createTempDirectory("graft_incprobe_maint").toString
        graft.operators.IncrementalDedup.writeIndex(
          hist, "doc_id", "text", path)
        val daily = docs.filter(col("n_chars") >= 100).limit(1000)
          .select(col("doc_id"), col("text")).localCheckpoint()
        val t0 = System.nanoTime()
        (0 until 30).foreach { i =>
          graft.operators.IncrementalDedup.appendToIndex(
            daily.select((col("doc_id") + 5000000L + i * 10000L)
              .as("doc_id"), col("text")),
            "doc_id", "text", path)
        }
        val appendSec = (System.nanoTime() - t0) / 1e9
        def filesPerBucket(sub: String): (Int, Double) = {
          val fs = new java.io.File(s"$path/$sub").listFiles()
            .filter(f => f.getName.startsWith("part-") &&
              !f.getName.endsWith(".crc"))
          val byBucket = fs.groupBy(_.getName.split("_").last.take(5))
          (byBucket.values.map(_.length).max,
            fs.length.toDouble / byBucket.size)
        }
        val (maxB, avgB) = filesPerBucket("fps")
        println(f"[incprobe] 30 appends in $appendSec%.1f s; fps " +
          f"files/bucket max $maxB avg $avgB%.1f")
        val probeAppended = time("probe after 30 appends")(
          probeOf(path).write.format("noop").mode("overwrite").save())
        // single timed pass, NOT the time() helper: its warm-up call
        // would do the real compaction and the timed pass would then
        // measure re-compacting an already-compact index
        val tc0 = System.nanoTime()
        graft.operators.IncrementalDedup.compactIndex(spark, path)
        val compactSec = (System.nanoTime() - tc0) / 1e9
        val (maxC, avgC) = filesPerBucket("fps")
        val probeCompacted = time("probe after compact")(
          probeOf(path).write.format("noop").mode("overwrite").save())
        println(f"[incprobe] maintained-index stamp: probe " +
          f"appended $probeAppended%.2f s -> compacted " +
          f"$probeCompacted%.2f s (compact cost $compactSec%.2f s, " +
          f"fps files/bucket $maxB -> $maxC)")
      }

      for ((variant, buckets) <- Seq("bucketed(32)" -> 32, "plain" -> 0)) {
        val path = java.nio.file.Files
          .createTempDirectory(s"graft_incprobe_$variant").toString
        val build = time(s"$variant index build (untimed in q51)")(
          graft.operators.IncrementalDedup.writeIndex(
            hist, "doc_id", "text", path, numBuckets = buckets))
        val probe = time(s"$variant daily probe")(
          probeOf(path).write.format("noop").mode("overwrite").save())
        // static-plan audit (AQE off for a deterministic count): how
        // many shuffles sit above the history-side index scans?
        val restore = Seq("spark.sql.adaptive.enabled",
          "spark.sql.autoBroadcastJoinThreshold")
          .map(k => k -> spark.conf.get(k))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val nEx = try indexExchanges(path, probeOf(path))
          finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
        println(f"[incprobe] $variant%-14s build $build%6.2f s  " +
          f"probe $probe%6.2f s  history-side exchanges (static plan): $nEx")
      }
    }
    spark.stop()
  }
}
