package graft

/** Benchmark main. Writes each query's full result to the `noop` sink so
  * Catalyst can't elide final sorts/projections the way it can under
  * `count()` (EliminateSorts), runs one untimed warm-up pass so the first
  * timed query isn't charged session/codegen startup, and prints exactly
  * one JSON line on stdout (build.sbt pins `run / outputStrategy` to
  * StdoutOutput so sbt doesn't prefix it).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Ingest throughput in the shape of the reference's own benchmark
    // (BASELINE.md: kafka_gen_log JSON → sinker → ClickHouse, 142-301 K
    // rows/s): generated access-log JSON → typed parse (JsonTypedRow) →
    // __kafka_* virtuals → shard routing → sink. Reported as a pseudo-
    // query in seconds; rows/s = INGEST_ROWS / seconds goes to stderr.
    val INGEST_ROWS = 2000000L
    def ingestOnce(n: Long): Double = {
      import graft.schema.ColumnSpec
      import graft.sources.{Generators, MessageParser, ParserConfig}
      import org.apache.spark.sql.functions.col
      val specs = Seq(
        ColumnSpec("@timestamp", "DateTime"),
        ColumnSpec("clientip", "String"),
        ColumnSpec("request", "String"),
        ColumnSpec("status", "Int32"),
        ColumnSpec("size", "Int64"),
        ColumnSpec("__kafka_topic", "String"),
        ColumnSpec("__kafka_partition", "Int32"),
        ColumnSpec("__kafka_offset", "Int64"))
      val t0 = System.nanoTime()
      Generators.accessLogJson(spark, n)
        .transform(MessageParser.project(specs, ParserConfig(format = "json")))
        .withColumn("__shard",
          graft.operators.Sharding.hashShard(col("clientip"), 3))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warm-up: session start, codegen, parquet footers
    // min of two timed passes: a single GC/compilation stall in a 60-job
    // JVM session otherwise lands on one arbitrary query and dominates
    // its number (observed: 1.4 s query charged 14 s). The System.gc()
    // between queries keeps one query's allocation debt (and the context
    // cleaner's unfreed broadcast/shuffle blocks, which are only
    // reclaimed after a GC) from being billed to the next — without it,
    // whole runs degrade 3× once ~60 jobs of garbage pile up.
    val queryResults = names.map { n =>
      System.gc()
      val a = runOnce(n); val b = runOnce(n)
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }
    // Ingest runs LAST: its 2M-row working set churns the heap, and GC
    // debt from it must not be charged to the per-query timings.
    ingestOnce(100000L) // codegen warm-up
    val ingestSec = ingestOnce(INGEST_ROWS)
    System.err.println(
      f"[bench] ingest: $INGEST_ROWS rows in $ingestSec%.2f s = ${INGEST_ROWS / ingestSec}%.0f rows/s")
    val results = queryResults :+ ("ingest_2m_jsonlog" -> ingestSec)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    System.out.println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
