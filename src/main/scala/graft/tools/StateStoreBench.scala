package graft.tools

import org.apache.spark.sql.functions._

/** A/B/C on the Bench stream-intake workload shape: the
  * `flatMapGroupsWithState` first-seen gate on the HDFS-backed (default,
  * state in executor heap) vs RocksDB (off-heap, the large-state scale
  * path) state store providers, plus a third row benching the
  * native-operator gate (`firstSeenExact` → `StreamingDeduplicateExec`)
  * on the default provider. */
object StateStoreBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = 500000L
    val base = java.nio.file.Files.createTempDirectory("graft_ss").toString
    spark.range(rows).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit("junk"))
        .otherwise(concat(lit("the document "),
          (col("id") % lit((rows * 9) / 10)).cast("string"),
          lit(" talks about a corpus topic and more"))).as("text"))
      .repartition(16).write.mode("overwrite").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema

    def run(tag: String, provider: Option[String],
        gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Double = {
      provider.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      def once(pass: String): Double = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 2).parquet(s"$base/in")
        val toks = split(col("text"), " ")
        val admitted = src
          .filter(size(toks) >= 5 &&
            arrays_overlap(toks, array(lit("the"), lit("a"), lit("and"))))
          .withColumn("fp",
            graft.functions.Hashes.fingerprint128(lower(trim(col("text")))))
        val t0 = System.nanoTime()
        gate(admitted)
          .writeStream.format("parquet")
          .option("path", s"$base/out_${tag}_$pass")
          .option("checkpointLocation", s"$base/ck_${tag}_$pass")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      once("warm")
      val t = Seq("a", "b").map { p => System.gc(); once(p) }.min
      println(f"[ssbench] $tag%-8s $t%6.2f s  (${rows / t}%.0f rows/s)")
      t
    }
    val fmgws = (df: org.apache.spark.sql.DataFrame) =>
      graft.streaming.StatefulDedup.firstSeen(df, "fp")
    val native = (df: org.apache.spark.sql.DataFrame) =>
      graft.streaming.StatefulDedup.firstSeenExact(df, "fp")
    run("hdfs", None, fmgws)
    run("rocksdb", Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      fmgws)
    // provider passed explicitly: the rocksdb row left the conf on RocksDB
    run("native", Some(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"),
      native)
    spark.stop()
  }
}
