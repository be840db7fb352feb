package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pins xxHash64(seed=0) to the official xxHash reference vectors so the
  * engine's sharding keys and Prometheus series ids agree with
  * cespare/xxhash (`xxhash.Sum64`, seed 0) as used by task/sharding.go:88-99
  * and model/message.go:171-212. Spark's SQL `xxhash64` defaults to seed 42,
  * so [[graft.functions.Hashes.xxhash64Seed0]] instantiates the Catalyst
  * expression with seed 0.
  */
class HashesSpec extends AnyFunSuite {

  private def xxh64(s: String): Long =
    new XxHash64(Seq(Literal(UTF8String.fromString(s), StringType)), 0L)
      .eval(InternalRow.empty).asInstanceOf[Long]

  private def xxh64bytes(b: Array[Byte]): Long =
    new XxHash64(Seq(Literal(b, BinaryType)), 0L)
      .eval(InternalRow.empty).asInstanceOf[Long]

  test("official xxHash64 seed-0 vectors") {
    // XXH64 of the empty input, seed 0 (xxHash spec / xxhsum test suite)
    assert(xxh64bytes(Array.emptyByteArray) === 0xef46db3751d8e999L)
    // XXH64("abc") — canonical public vector
    assert(xxh64("abc") === 0x44bc2cf5ad770999L)
    // string and raw-byte hashing agree (the reference hashes raw bytes)
    assert(xxh64("abc") === xxh64bytes("abc".getBytes("UTF-8")))
    assert(xxh64("###__name__###cpu_usage") ===
      xxh64bytes("###__name__###cpu_usage".getBytes("UTF-8")))
  }

  test("seed 0 differs from Spark's default seed 42 (regression guard)") {
    val seed42 = new XxHash64(
      Seq(Literal(UTF8String.fromString("abc"), StringType)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]
    assert(seed42 !== xxh64("abc"))
  }
}
