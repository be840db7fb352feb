package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ColumnBridge, SequenceCountExpr, SequenceMatchExpr}

/** Batch `sequenceMatch` / `sequenceCount` (ClickHouse event-analytics
  * family, beside q54-q56's sessionize/windowFunnel/retention — the
  * workloads the reference's users run on the ingested event store).
  *
  * Shape: ONE hash shuffle on the user key. Events matching no
  * condition are dropped BEFORE the shuffle (ClickHouse parity: the
  * aggregate never collects them), each kept event is projected to 16
  * bytes (time micros + condition bitmask) — the event payload never
  * moves — and the per-user sorted array feeds the pattern DP
  * ([[graft.functions.SequencePattern]]). Per-user state is the
  * considered-event list, exactly the memory contract of ClickHouse's
  * own sequenceMatch aggregate; condition selectivity is the dial that
  * keeps it bounded at 100 TB. Several patterns over the same condition
  * set evaluate from ONE collected array (q60 computes four).
  */
object SequenceMatch {

  /** (user, __ev) with `__ev` = time-sorted array<struct<t,mask>> of
    * the events matching at least one condition. `conds` are boolean
    * Columns over the event row, 1-based in pattern references. */
  def collectSequences(
      events: DataFrame, userCol: String, tsCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty && conds.size <= 62,
      s"1..62 conditions supported, got ${conds.size}")
    val mask = conds.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_.bitwiseOR(_))
    events
      .select(col(userCol), unix_micros(col(tsCol)).as("__t"), mask.as("__mask"))
      .filter(col("__mask") =!= 0L)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("__t"), col("__mask"))))
        .as("__ev"))
  }

  /** sequenceMatch over a `collectSequences` array column. */
  def matchPattern(ev: Column, pattern: String): Column =
    ColumnBridge.col(SequenceMatchExpr(ColumnBridge.expr(ev), pattern))

  /** sequenceCount (non-overlapping, earliest-end greedy) over a
    * `collectSequences` array column. */
  def countPattern(ev: Column, pattern: String): Column =
    ColumnBridge.col(SequenceCountExpr(ColumnBridge.expr(ev), pattern))
}
