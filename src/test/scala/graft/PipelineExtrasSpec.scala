package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GapFill, IncrementalAgg, SourceQuota}

/** Round-7 operators: per-key quotas (bounded-heap vs window model),
  * WITH FILL gap grids, and incremental aggregate maintenance. */
class SourceQuotaSpec extends SparkSuite {

  test("cap reproduces the row_number window model, over- and under-quota") {
    import spark.implicits._
    // key A: 10 rows (over quota 4), key B: 2 rows (under), key C: empty
    // priority space exercised with genuine hash ordering
    val df = ((1L to 10L).map(i => ("A", i)) ++ Seq(("B", 100L), ("B", 101L)))
      .toDF("k", "id")
    val got = SourceQuota.cap(df, "k", "id", n = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy("k")
      .orderBy(SourceQuota.hashPriority(col("id")), col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 4)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getLong(1))).toSet
    assert(got === want)
    assert(got.count(_._1 == "A") === 4)
    assert(got.count(_._1 == "B") === 2)
  }

  test("cap is partition-layout invariant (map-side partials merge exactly)") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (s"k${i % 3}", i)).toDF("k", "id")
    def run(parts: Int): Set[(String, Int, Long)] =
      SourceQuota.cap(df.repartition(parts), "k", "id", n = 7).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(1) === run(13))
  }

  test("quota aggregation runs as partial + final (no per-key row sort)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("k", i)).toDF("k", "id")
    val plan = SourceQuota.cap(df, "k", "id", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_boundedtopn") ||
      plan.toLowerCase.contains("partial"), s"no partial aggregation in:\n$plan")
    assert(!plan.contains("Window"), "quota must not use a window sort")
  }
}

class GapFillSpec extends SparkSuite {

  test("grid densifies per series between its own min and max; gaps flagged") {
    import spark.implicits._
    val df = Seq(
      ("s1", "2024-01-01 00:10:00", 1.0),
      ("s1", "2024-01-01 03:20:00", 2.0), // hours 1,2 missing
      ("s2", "2024-01-01 02:05:00", 5.0)) // single bucket, no fill
      .toDF("k", "ts", "v")
      .select(col("k"), col("ts").cast("timestamp").as("ts"), col("v"))
    val got = GapFill.fillTimeBuckets(df, "k", "ts", "1 hour",
        Seq("cnt" -> count(lit(1)), "sv" -> sum(col("v"))))
      .orderBy("series", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(got.toSeq === Seq(
      ("s1", "2024-01-01 00:00:00.0", 1L, 1.0, 0),
      ("s1", "2024-01-01 01:00:00.0", 0L, 0.0, 1),
      ("s1", "2024-01-01 02:00:00.0", 0L, 0.0, 1),
      ("s1", "2024-01-01 03:00:00.0", 1L, 2.0, 0),
      ("s2", "2024-01-01 02:00:00.0", 1L, 5.0, 0)))
  }

  test("INTERPOLATE columns carry the last observed value across gaps") {
    import spark.implicits._
    val df = Seq(
      ("s1", "2024-01-01 00:10:00", 7.0),
      ("s1", "2024-01-01 03:20:00", 2.0))
      .toDF("k", "ts", "v")
      .select(col("k"), col("ts").cast("timestamp").as("ts"), col("v"))
    val got = GapFill.fillTimeBuckets(df, "k", "ts", "1 hour",
        Seq("cnt" -> count(lit(1)), "sv" -> sum(col("v")),
          "locf" -> sum(col("v"))),
        interpolate = Seq("locf"))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5)))
    assert(got.toSeq === Seq(
      (1L, 7.0, 7.0, 0), (0L, 0.0, 7.0, 1),
      (0L, 0.0, 7.0, 1), (1L, 2.0, 2.0, 0)))
  }

  test("day step aligns to day boundaries") {
    import spark.implicits._
    val df = Seq(("s", "2024-03-01 23:59:00", 1.0), ("s", "2024-03-04 00:01:00", 2.0))
      .toDF("k", "ts", "v")
      .select(col("k"), col("ts").cast("timestamp").as("ts"), col("v"))
    val got = GapFill.fillTimeBuckets(df, "k", "ts", "1 day",
        Seq("cnt" -> count(lit(1))))
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1).toString.take(10), r.getLong(2), r.getInt(3)))
    assert(got.toSeq === Seq(
      ("2024-03-01", 1L, 0), ("2024-03-02", 0L, 1),
      ("2024-03-03", 0L, 1), ("2024-03-04", 1L, 0)))
  }
}

class IncrementalAggSpec extends SparkSuite {

  test("merge(partials(A), partials(B)) == partials(A ∪ B) for any split") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      (s"s${rnd.nextInt(5)}", s"l${rnd.nextInt(3)}", rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("source", "lang", "v")
    val keys = Seq("source", "lang")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("source", "lang").collect().map(_.toSeq).toSeq
    val direct = IncrementalAgg.partials(df, keys, "v")
    for (mod <- Seq(2, 3, 7)) {
      val a = df.filter(col("v") % mod === 0)
      val b = df.filter(col("v") % mod =!= 0)
      val merged = IncrementalAgg.merge(keys,
        IncrementalAgg.partials(a, keys, "v"),
        IncrementalAgg.partials(b, keys, "v"))
      assert(canon(merged) === canon(direct), s"split mod=$mod")
    }
  }

  test("merge is associative across three daily batches") {
    import spark.implicits._
    val df = (1L to 90L).map(i => (s"s${i % 4}", "en", i)).toDF("source", "lang", "v")
    val keys = Seq("source", "lang")
    val parts = (0L to 2L).map(d => IncrementalAgg.partials(
      df.filter(col("v") % 3 === d), keys, "v"))
    val leftFold = IncrementalAgg.merge(keys,
      IncrementalAgg.merge(keys, parts(0), parts(1)), parts(2))
    val allAtOnce = IncrementalAgg.merge(keys, parts: _*)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("source", "lang").collect().map(_.toSeq).toSeq
    assert(canon(leftFold) === canon(allAtOnce))
  }

  test("state round-trips through the bucketed parquet layout") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (s"s${i % 6}", s"l${i % 2}", i)).toDF("source", "lang", "v")
    val keys = Seq("source", "lang")
    val state = IncrementalAgg.partials(df, keys, "v")
    val p = java.nio.file.Files.createTempDirectory("incagg").toString
    IncrementalAgg.writeState(state, p)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("source", "lang", "cnt", "sum_v", "min_v", "max_v")
        .orderBy("source", "lang").collect().map(_.toSeq).toSeq
    assert(canon(IncrementalAgg.readState(spark, p)) === canon(state))
  }
}
