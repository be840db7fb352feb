package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.graftshim.Bridge

/** Bridge between the public Column API and Catalyst expressions (Spark 4
  * classic converters), plus the engine's pinned hash functions.
  */
object ColumnBridge {
  def expr(c: Column): Expression = Bridge.expression(c)
  def col(e: Expression): Column = Bridge.column(e)
}

object Hashes {
  import ColumnBridge._

  /** xxHash64 with seed 0 — parity with cespare/xxhash (`xxhash.Sum64`)
    * used by the reference for row sharding (task/sharding.go:88-99) and
    * Prometheus series ids (model/message.go:171-212). Spark's built-in
    * `xxhash64` pins seed 42, so instantiate the Catalyst expression with
    * seed 0 directly; on string/binary input Spark's XXH64 is the
    * standard algorithm over the raw bytes.
    */
  def xxhash64Seed0(cols: Column*): Column =
    col(new XxHash64(cols.map(expr), 0L))
}
