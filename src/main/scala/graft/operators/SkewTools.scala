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

  /** Equi-join `left ⋈ right` on `keyCol`, skew-spread: left rows salt
    * by a deterministic hash of `saltBy` (any row-distinguishing left
    * column, e.g. its primary key) mod `nSalts`; right rows replicate
    * once per salt via a tiny explode. Result equals the plain join. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      saltBy: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(nSalts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    l.join(r, Seq(keyCol, "__salt"), joinType).drop("__salt")
  }
}
