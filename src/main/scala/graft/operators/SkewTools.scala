package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. AQE's skew-join split
  * (enabled in `Sessions.builder`) handles most skew at runtime by
  * splitting oversized partitions, but it cannot split a SINGLE hot key
  * whose rows must meet matching build rows. Salting can: the probe
  * side's hot key spreads over `nSalts` sub-keys and the build side
  * replicates `nSalts`× so every sub-key still finds its matches — the
  * hot key's work then runs on `nSalts` tasks instead of one.
  *
  * Replication multiplies the build side, so use a salt count sized to
  * the hot key's excess (8–32), not hundreds, and only when the build
  * side is too big to broadcast (a broadcast join has no skew problem —
  * always prefer it when the small side fits).
  */
object SkewTools {

  /** Join types whose result is unchanged by replicating the build
    * (right) side: every right row's contribution is gated by a matching
    * left row, so duplicates of an unmatched right row never surface. */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  /** Equi-join `left ⋈ right` on `keyCol`, skew-spread: left rows salt
    * by a deterministic hash of `saltBy` (any row-distinguishing left
    * column, e.g. its primary key) mod `nSalts`; right rows replicate
    * once per salt via a tiny explode. Result equals the plain join.
    *
    * `joinType` is restricted to inner/left variants: right/full outer
    * would emit each UNMATCHED right row `nSalts` times (the replicas
    * land under distinct salts and none finds a left partner), silently
    * multiplying the outer side. Spread a right-outer join by calling
    * with the sides swapped and `"left"`. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      saltBy: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    require(SafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got '$joinType': the " +
        "replicated build side would emit unmatched right rows nSalts times")
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(nSalts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    l.join(r, Seq(keyCol, "__salt"), joinType).drop("__salt")
  }

  /** Wrap a bucket-size column with the hot-bucket warning
    * ([[graft.functions.WarnHotBucket]] → [[graft.functions.SkewWarn]]):
    * value passes through unchanged; a population at or past
    * `SkewWarn.threshold` logs a named skew warning from the task that
    * owns the bucket. Used by every collect-shaped blocking self-join
    * (HammingBand / MinHashLsh / JaccardJoin) on the size their `> 1`
    * filter already evaluates — zero extra cost. */
  def monitoredSize(size: Column, tag: String): Column =
    graft.functions.ColumnBridge.col(graft.functions.WarnHotBucket(
      graft.functions.ColumnBridge.expr(size), tag))
}
