package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the bench's streaming-intake gate: same 500k-doc
  * pipeline as Bench's `streamOnce`, run in a session WITH and WITHOUT
  * the graft SQL extensions — isolates whether extension injection
  * costs anything on the per-micro-batch planning path. */
object StreamGateProbe {
  /** args: [withExtensions] [mode]; mode ∈ gate (default) | nodedup
    * (drop the stateful dedup stage) | p8 (8 shuffle/state partitions)
    * | rocksdb (RocksDB provider) | sized (the production path:
    * StatefulDedup.withStatePartitions + statePartitionsFor, exactly
    * what Bench.streamOnce runs) — decomposes the gate time into
    * state-store vs sink vs planning. */
  def main(args: Array[String]): Unit = {
    val withExt = args.headOption.forall(_.toBoolean)
    val mode = args.drop(1).headOption.getOrElse("gate")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", if (mode == "p8") "8" else "32")
      .config("spark.sql.streaming.stateStore.providerClass",
        if (mode == "rocksdb")
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (withExt)
      b.config("spark.sql.extensions", "graft.GraftExtensions") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = 500000L
    val base = java.nio.file.Files.createTempDirectory("probe").toString
    val in = s"$base/in"
    spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit("junk"))
        .otherwise(concat(lit("the document "),
          (col("id") % lit((n * 9) / 10)).cast("string"),
          lit(" talks about a corpus topic and more"))).as("text"))
      .repartition(16).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema

    def once(pass: Int): Double = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(in)
      val toks = split(col("text"), " ")
      val admitted = src
        .filter(size(toks) >= 5 &&
          arrays_overlap(toks, array(lit("the"), lit("a"), lit("and"))))
        .withColumn("fp",
          graft.functions.Hashes.fingerprint128(lower(trim(col("text")))))
      val t0 = System.nanoTime()
      val gated =
        if (mode == "nodedup") admitted
        else graft.streaming.StatefulDedup.firstSeenExact(admitted, "fp")
      def run(): Unit = gated
        .writeStream.format("parquet")
        .option("path", s"$base/out$pass")
        .option("checkpointLocation", s"$base/ck$pass")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      if (mode == "sized")
        graft.streaming.StatefulDedup.withStatePartitions(spark,
          graft.streaming.StatefulDedup.statePartitionsFor(n * 2 / 16))(run())
      else run()
      (System.nanoTime() - t0) / 1e9
    }
    once(0)
    val t = (1 to 2).map { p => System.gc(); once(p) }.min
    println(f"[probe] extensions=$withExt mode=$mode stream gate: $t%.2f s")
    spark.stop()
  }
}
