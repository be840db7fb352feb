package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Pins the whole point of bucketing: the join of two same-bucketed
  * tables plans with NO Exchange and NO per-bucket Sort (both paid once
  * at write time), and mismatched bucket counts fail loudly instead of
  * silently shuffling. */
class BucketingSpec extends SparkSuite {

  test("same-bucketed join is exchange-free and sort-free; results exact") {
    import spark.implicits._
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("a")),
        "bkt_left", "k", nBuckets = 8)
      Bucketing.writeBucketed(
        spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("b")),
        "bkt_right", "k", nBuckets = 8)

      // the session posture (Sessions.builder, r19): the sorted-scan
      // conf is ON, writeBucketed guarantees one file per bucket, so
      // the write-time sort is trusted and the join plans with neither
      // Exchange NOR per-bucket Sort — both paid once at write time
      val joined = Bucketing.colocatedJoin(spark, "bkt_left", "bkt_right", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(!plan.contains("Sort "), s"unexpected per-bucket sort in:\n$plan")
      assert(joined.count() === 1000)
      assert(joined.filter(col("k") === 10).select("a", "b").head() ===
        org.apache.spark.sql.Row(3L, 20L))

      // with the conf OFF (Spark 3.0+ default), the reader ignores the
      // write-time sort and a cheap in-bucket Sort returns; Exchange
      // elision — the data-motion win — is conf-independent
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      try {
        val unsorted = Bucketing.colocatedJoin(spark, "bkt_left", "bkt_right", "k")
        val p2 = unsorted.queryExecution.executedPlan.toString
        assert(!p2.contains("Exchange"), s"unexpected shuffle in:\n$p2")
        assert(p2.contains("Sort "),
          "expected in-bucket sorts with the sorted-scan conf off")
        assert(unsorted.count() === 1000)
      } finally spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("mismatched bucket counts are rejected, not silently shuffled") {
    import spark.implicits._
    try {
      Bucketing.writeBucketed(
        spark.range(10).select(col("id").as("k")), "bkt_a", "k", 4)
      Bucketing.writeBucketed(
        spark.range(10).select(col("id").as("k")), "bkt_b", "k", 8)
      val e = intercept[IllegalArgumentException] {
        Bucketing.colocatedJoin(spark, "bkt_a", "bkt_b", "k")
      }
      assert(e.getMessage.contains("bucket counts differ"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("bucketed-on-a-different-column table is rejected") {
    import spark.implicits._
    try {
      Bucketing.writeBucketed(
        spark.range(10).select(col("id").as("k"), (col("id") + 1).as("other")),
        "bkt_k", "k", 4)
      Bucketing.writeBucketed(
        spark.range(10).select(col("id").as("k"), (col("id") + 1).as("other")),
        "bkt_other", "other", 4)
      val e = intercept[IllegalArgumentException] {
        Bucketing.colocatedJoin(spark, "bkt_k", "bkt_other", "k")
      }
      assert(e.getMessage.contains("not on join key"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_k")
      spark.sql("DROP TABLE IF EXISTS bkt_other")
    }
  }

  test("unbucketed table is rejected") {
    import spark.implicits._
    try {
      spark.range(10).select(col("id").as("k"))
        .write.mode("overwrite").format("parquet").saveAsTable("bkt_plain")
      Bucketing.writeBucketed(
        spark.range(10).select(col("id").as("k")), "bkt_c", "k", 4)
      val e = intercept[IllegalArgumentException] {
        Bucketing.colocatedJoin(spark, "bkt_plain", "bkt_c", "k")
      }
      assert(e.getMessage.contains("not bucketed"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_plain")
      spark.sql("DROP TABLE IF EXISTS bkt_c")
    }
  }
}
