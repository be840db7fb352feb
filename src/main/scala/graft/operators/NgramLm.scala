package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * signal: score every document by the average negative log-likelihood
  * (nats/token) of an add-one-smoothed bigram LM trained on the corpus
  * itself, then bucket into head / middle / tail quality tiers. CCNet
  * uses an external KenLM; self-training on the corpus keeps the
  * operator hermetic while exercising the identical pipeline shape
  * (count grams → score docs against the counts → threshold). No
  * reference analog; LLM-pipeline extension surface.
  *
  * Scale shape: one token-stream pass builds per-doc bigram tf keyed by
  * 8-byte gram fingerprints (gram TEXT never leaves its scan stage, as
  * in q35/q37); the model's global counts (c2 per bigram, c1 per
  * context) derive from that tf by re-aggregation, so the corpus is
  * tokenized once for counting and once for the vocabulary size — every
  * shuffle is O(total tokens) at fingerprint width. Scoring joins tf
  * back to c2/c1 on the 8-byte keys (gram-cardinality-sized sides; at
  * 100 TB these are shuffle joins, deliberately not broadcast — a web
  * corpus's bigram table is executor-memory-hostile). The tf aggregate
  * is localCheckpointed for its two consumers (model counts + scoring),
  * the [[Bm25.search]] pattern. Tier thresholds are CALLER-SUPPLIED
  * literals, so bucketing is a pure map — deriving them is an offline
  * quantile job ([[Quantiles]], q29/q42); an in-query global
  * ntile/row_number would be the single-partition-window scale-killer
  * this codebase bans.
  *
  * Hash-fingerprint counting means two distinct grams can collide and
  * pool their counts (~1e-9 at millions of grams) — accepted and
  * documented as in q23/q35/q37/q49.
  */
object NgramLm {

  /** Per-document perplexity profile: (id, n_tokens, n_bigrams, nll,
    * bucket). `nll` is the µ-rounded (6) average negative log-likelihood
    * in nats (lower = more predictable = "head"); accumulation is
    * DECIMAL(28,12) so the sum is partition-order independent and
    * libm-vs-JVM `ln` ulp differences die before the rounding
    * ([[Bm25]]'s parity discipline). Docs with fewer than 2 tokens have
    * no bigrams: nll NULL, bucket "unscored" — they appear exactly once
    * like every other doc. */
  def perplexityProfile(
      docs: DataFrame, idCol: String, textCol: String,
      headMax: Double, middleMax: Double): DataFrame = {
    val w = split(col(textCol), " ")
    val pairs = docs
      .select(col(idCol), w.as("__w"),
        // guard: Spark's sequence(1, n) with n < 1 counts DOWN
        explode(when(size(w) >= 2, sequence(lit(1), size(w) - 1))
          .otherwise(array().cast("array<int>"))).as("__i"))
      .select(col(idCol),
        Hashes.xxhash64Seed0(element_at(col("__w"), col("__i"))).as("__hp"),
        Hashes.xxhash64Seed0(concat_ws(" ",
          element_at(col("__w"), col("__i")),
          element_at(col("__w"), col("__i") + 1))).as("__hb"))
    // __hp is functionally dependent on __hb (same prev token) — it rides
    // the grouping so scoring needs no second tokenization to recover it
    val tf = pairs.groupBy(col(idCol), col("__hb"), col("__hp"))
      .agg(count(lit(1)).as("__tf"))
      .localCheckpoint()
    val c2 = tf.groupBy("__hb").agg(sum(col("__tf")).as("__c2"))
    val c1 = tf.groupBy("__hp").agg(sum(col("__tf")).as("__c1"))
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("__t"))
      .agg(countDistinct(Hashes.xxhash64Seed0(col("__t"))).as("__v"))
    val term = tf
      .join(c2, "__hb")
      .join(c1, "__hp")
      .crossJoin(broadcast(vocab))
      // p(cur|prev) = (c2+1)/(c1+V); exact-integer casts, then one ln —
      // operand order mirrored verbatim in the SQL oracle
      .withColumn("__s",
        (log((col("__c2").cast("double") + 1.0) /
          (col("__c1") + col("__v")).cast("double")) * col("__tf"))
          .cast("decimal(28,12)"))
    val perDoc = term.groupBy(idCol)
      .agg(sum(col("__s")).as("__ss"), sum(col("__tf")).as("n_bigrams"))
    docs
      .select(col(idCol), size(w).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(-(col("__ss").cast("double")) / col("n_bigrams"), 6).as("nll"))
      .withColumn("bucket",
        when(col("nll").isNull, "unscored")
          .when(col("nll") <= headMax, "head")
          .when(col("nll") <= middleMax, "middle")
          .otherwise("tail"))
  }
}
