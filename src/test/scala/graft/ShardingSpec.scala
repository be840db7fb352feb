package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.operators.{Sharding, UnsignedMod, UnsignedStripeShard}

/** Sharder parity (task/sharding.go:20-101): unsigned stripe/hash
  * arithmetic incl. negative-value wrap, time keys as epoch seconds, and
  * shard→partition co-location after repartition.
  */
class ShardingSpec extends SparkSuite {

  private def stripeEval(v: Long, stripe: Long, n: Int): Int =
    UnsignedStripeShard(Literal(v, LongType), stripe, n)
      .eval(InternalRow.empty).asInstanceOf[Int]

  test("stripe shard arithmetic") {
    assert(stripeEval(0L, 16, 5) === 0)
    assert(stripeEval(15L, 16, 5) === 0)
    assert(stripeEval(16L, 16, 5) === 1)
    assert(stripeEval(16L * 5, 16, 5) === 0)
    assert(stripeEval(16L * 7 + 3, 16, 5) === 2)
    // Go converts int64 → uint64 with wraparound: uint64(-1) =
    // 18446744073709551615; /16 = 1152921504606846975; %5 = 0.
    assert(stripeEval(-1L, 16, 5) === 0)
  }

  test("timestamp keys stripe on epoch seconds (time.Time → Unix())") {
    val e = UnsignedStripeShard(
      Literal(7200L * 1000000L + 123456L, TimestampType), 3600, 5)
    assert(e.eval(InternalRow.empty) === 2) // 7200s / 3600 = 2, % 5 = 2
  }

  test("TIMESTAMP_NTZ keys also stripe on seconds, not raw micros") {
    // NTZ shares TIMESTAMP's micros-Long encoding; pre-fix it fell through
    // to the raw-integer branch and striped micros (wrong by 10^6).
    val e = UnsignedStripeShard(
      Literal(7200L * 1000000L + 123456L, TimestampNTZType), 3600, 5)
    assert(e.eval(InternalRow.empty) === 2)
  }

  test("unsigned mod differs from pmod for negative hashes") {
    // uint64(-5) = 2^64 - 5; (2^64 - 5) % 3 = 2 (Go), while pmod(-5,3) = 1.
    assert(UnsignedMod(Literal(-5L, LongType), 3)
      .eval(InternalRow.empty) === 2)
    assert(UnsignedMod(Literal(7L, LongType), 3)
      .eval(InternalRow.empty) === 1)
  }

  test("hash shard = xxhash64 seed0 mod n over strings") {
    import spark.implicits._
    val df = Seq("a", "abc", "xxhash", "").toDF("k")
      .withColumn("shard", Sharding.hashShard(col("k"), 8))
    val shards = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // xxh64("", 0) = 0xef46db3751d8e999 → unsigned % 8 = 0x...99 % 8 = 1
    assert(shards("") === java.lang.Long.remainderUnsigned(0xef46db3751d8e999L, 8).toInt)
    assert(shards("abc") === java.lang.Long.remainderUnsigned(0x44bc2cf5ad770999L, 8).toInt)
    assert(shards.values.forall(s => s >= 0 && s < 8))
  }

  test("repartitionByShard co-locates whole shards") {
    import spark.implicits._
    val n = 8
    val df = (0L until 1000L).toDF("id")
      .withColumn("shard", Sharding.stripeShard(col("id"), 16, n))
    val routed = Sharding.repartitionByShard(df, col("shard"), n)
    assert(routed.rdd.getNumPartitions === n)
    val pairs = routed.select("shard").rdd
      .mapPartitionsWithIndex { (pid, it) => it.map(r => (r.getInt(0), pid)) }
      .distinct().collect()
    // every shard id lives in exactly one partition
    val byShard = pairs.groupBy(_._1).view.mapValues(_.length)
    assert(byShard.values.forall(_ === 1), byShard.toMap.toString)
  }
}
