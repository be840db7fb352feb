package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing: the stratified over/undersampling stage that turns raw
  * corpora into a training mix ("web ×0.5, wiki ×2.5"). Each stratum has
  * a sampling weight w: every doc emits floor(w) full copies, plus one
  * more when its hash bucket falls below the fractional part — so the
  * realized rate is w in expectation up to double rounding (the
  * `(w − floor(w)) × buckets` threshold is IEEE-double arithmetic, so a
  * fraction that is not exactly representable — 0.1, say — can shift
  * the cut by one bucket in a thousand; the oracle computes the SAME
  * double expression, so the two sides always agree bit for bit), the
  * choice is deterministic per doc (reproducible mixes, no RNG), and
  * subsampling
  * (w < 1), pass-through (w = 1) and epoch-style oversampling (w > 1)
  * are all the same rule.
  *
  * Scale shape: the weight table is a broadcast dim (strata are few by
  * definition); copy fan-out is a map-side explode — no shuffle at all,
  * the mix is a pure one-pass projection of the corpus scan. The bucket
  * is any integer expression in [0, buckets); production mixes hash the
  * document id/fingerprint, fixture oracles can pass a plain modulus so
  * the rule stays SQL-expressible.
  */
object CorpusMix {

  /** Temperature (α) sampling weights derived from the corpus itself —
    * the multilingual-balancing rule (sampled share p_i ∝ (n_i/N)^α;
    * α=1 keeps natural proportions, α→0 approaches uniform): per
    * stratum, weight w_i = (q_i^α / Σ_j q_j^α) · N / n_i, sized so the
    * mixed corpus stays ≈N docs. Output: (stratumCol, weight) — feed
    * straight into [[mix]].
    *
    * Determinism: the only cross-row reduction is Σ q_j^α, carried as
    * CAST-to-DECIMAL(28,12) terms (strata are few, pow is identical
    * IEEE both engines), so the weights — and hence every downstream
    * copy decision — are bit-reproducible and oracle-mirrorable. */
  def temperatureWeights(
      docs: DataFrame, stratumCol: String, alpha: Double): DataFrame = {
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
    val tot = counts.agg(sum(col("__cnt")).as("__N"))
    val nd = col("__cnt").cast("double"); val bigN = col("__N").cast("double")
    val term = pow(nd / bigN, alpha)
    val s = counts.crossJoin(broadcast(tot))
      .agg(sum(term.cast(org.apache.spark.sql.types.DecimalType(28, 12)))
        .cast("double").as("__S"))
    counts.crossJoin(broadcast(tot)).crossJoin(broadcast(s))
      // left-assoc operand order mirrored verbatim in the oracle SQL
      .select(col(stratumCol),
        (term / col("__S") * bigN / nd).as("weight"))
  }

  /** `docs` joined to `weights` (stratumCol, weight) and fanned out to
    * one row per (doc, copy), copy = 1..n_copies. Docs in strata with
    * weight 0 (or absent from `weights`) emit nothing. */
  def mix(docs: DataFrame, weights: DataFrame, stratumCol: String,
          bucket: Column, buckets: Int = 1000): DataFrame = {
    val w = col("__w")
    val nCopies = (floor(w).cast("long") +
      when(bucket < (w - floor(w)) * buckets, 1L).otherwise(0L)).as("__n")
    val outCols = docs.columns.map(col).toSeq
    docs
      .join(broadcast(weights.withColumnRenamed("weight", "__w")), stratumCol)
      .withColumn("__n", nCopies)
      // null when n=0 → explode emits zero rows (house null-guard idiom)
      .select(outCols :+
        explode(when(col("__n") >= 1, sequence(lit(1L), col("__n"))))
          .as("copy"): _*)
  }
}
