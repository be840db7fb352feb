package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

import graft.functions.ColumnBridge

/** Row-level sharding (task/sharding.go:20-101): deterministic shard id per
  * row from either
  *  - `stripe,<size>`: `(uint64(key) / size) % n` for integer/time keys
  *    (times are epoch seconds), or
  *  - `hash`: `xxhash64seed0(key) % n` for string keys,
  * both in UNSIGNED 64-bit arithmetic like the Go original (a negative
  * int64 key or hash wraps, it does not mirror).
  *
  * At scale the shard id drives `repartition(n, shard)` so each output
  * partition holds whole shards and a per-shard JDBC writer can route rows
  * without any further shuffle; the expression itself is per-row O(1)
  * arithmetic with no state.
  */
object Sharding {

  /** `(uint64(key)/stripe) % n` — Calc's stripe branch (sharding.go:53-87).
    * Timestamp keys collapse to epoch seconds first (`time.Time → Unix()`). */
  def stripeShard(key: Column, stripe: Long, n: Int): Column = {
    require(stripe > 0, "stripe must be positive")
    ColumnBridge.col(UnsignedStripeShard(ColumnBridge.expr(key), stripe, n))
  }

  /** `xxhash64_seed0(key) % n` — Calc's hash branch (sharding.go:88-99). */
  def hashShard(key: Column, n: Int): Column =
    ColumnBridge.col(UnsignedMod(new XxHash64(Seq(ColumnBridge.expr(key)), 0L), n))

  /** Co-locate whole shards: every row of a shard lands in one partition,
    * so a `foreachPartition` writer groups by the (few) shard ids present
    * and routes each group to its endpoint. */
  def repartitionByShard(df: DataFrame, shard: Column, n: Int): DataFrame =
    df.repartition(n, shard)

  /** Smallest shift with `1 << shift >= s` — the buffer-size roundup used
    * for batch alignment (`GetShift`, util/common.go:104-108). */
  def roundupShift(s: Int): Int = {
    // 1<<31 is negative and Java masks shift counts mod 32, so an
    // unbounded loop would never terminate past 2^30 — fail fast instead
    // (the reference caps bufferSize at 2^20, config/config.go:257-263)
    require(s <= (1 << 30), s"roundupShift: $s exceeds 2^30")
    var shift = 0
    while ((1 << shift) < s) shift += 1
    shift
  }
}

/** `Long.divideUnsigned(v, stripe)` then unsigned mod n; timestamps (µs)
  * are first floored to epoch seconds. */
case class UnsignedStripeShard(child: Expression, stripe: Long, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  // NTZ timestamps evaluate to the same micros-Long encoding as TIMESTAMP;
  // without this both-types check an NTZ key would silently stripe raw
  // micros (observed against regenerated µs-NTZ testdata).
  @transient private lazy val secondsInput: Boolean =
    child.dataType == TimestampType || child.dataType == TimestampNTZType

  override def nullSafeEval(input: Any): Any = {
    val raw = input match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case s: java.lang.Short => s.longValue
      case b: java.lang.Byte => b.longValue
      case other => throw new IllegalArgumentException(
        s"stripe sharding needs an integer/time key, got $other")
    }
    val v = if (secondsInput) Math.floorDiv(raw, 1000000L) else raw
    java.lang.Integer.valueOf(
      java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(v, stripe), n.toLong).toInt)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unsigned `child % n` — Go's `valu64 % uint64(n)`; differs from `pmod`
  * for inputs whose sign bit is set. */
case class UnsignedMod(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      java.lang.Long.remainderUnsigned(input.asInstanceOf[Long], n.toLong).toInt)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
