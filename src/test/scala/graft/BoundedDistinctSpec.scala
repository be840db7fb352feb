package graft

import org.apache.spark.sql.functions._

import graft.functions.{BoundedDistinct, ColumnBridge, Hashes}

/** [[graft.functions.BoundedDistinct]] — ClickHouse `uniqUpTo(N)`:
  * exact below the cap, pinned at N+1 above it, mergeable across
  * partitions (the multi-partition runs force serialize/merge). */
class BoundedDistinctSpec extends SparkSuite {
  import spark.implicits._

  private def uniqUpTo(c: org.apache.spark.sql.Column, n: Int) =
    ColumnBridge.col(
      BoundedDistinct(ColumnBridge.expr(c), n).toAggregateExpression())

  test("exact when distinct <= N, saturates at N+1 when above") {
    val df = Seq.tabulate(100) { i => ("low", (i % 3).toLong) } ++
      Seq.tabulate(100) { i => ("high", (i % 20).toLong) }
    val got = df.toDF("k", "v").repartition(8)
      .groupBy("k").agg(uniqUpTo(col("v"), 5).as("u"))
      .as[(String, Long)].collect().toMap
    assert(got("low") === 3L)  // 3 distinct, under the cap: exact
    assert(got("high") === 6L) // 20 distinct, capped: N+1
  }

  test("boundary: exactly N and exactly N+1 distinct values") {
    val df = (Seq.tabulate(5)(i => ("atcap", i.toLong)) ++
      Seq.tabulate(6)(i => ("justover", i.toLong)))
    val got = df.toDF("k", "v").repartition(6)
      .groupBy("k").agg(uniqUpTo(col("v"), 5).as("u"))
      .as[(String, Long)].collect().toMap
    assert(got("atcap") === 5L)
    assert(got("justover") === 6L)
  }

  test("nulls are ignored, like ClickHouse uniq* over Nullable") {
    val df = Seq[(String, Option[Long])](
      ("k", Some(1L)), ("k", None), ("k", Some(2L)), ("k", None))
    val got = df.toDF("k", "v").repartition(3)
      .groupBy("k").agg(uniqUpTo(col("v"), 10).as("u"))
      .as[(String, Long)].collect().toMap
    assert(got("k") === 2L)
  }

  test("matches least(count distinct, N+1) on seeded random data, " +
    "string values via fingerprint") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 2000).map { _ =>
      val k = s"g${rnd.nextInt(30)}"
      (k, s"v${rnd.nextInt(1 + rnd.nextInt(40))}")
    }
    val df = rows.toDF("k", "s").repartition(16)
    val n = 12
    val got = df
      .groupBy("k").agg(uniqUpTo(Hashes.xxhash64Seed0(col("s")), n).as("u"))
      .as[(String, Long)].collect().toMap
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      k -> math.min(vs.map(_._2).distinct.size, n + 1).toLong
    }
    assert(got === expected)
  }
}
