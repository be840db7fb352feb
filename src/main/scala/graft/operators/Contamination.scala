package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard contamination
  * check a training-data pipeline runs before the corpus ships (the same
  * n-gram-overlap definition used by published LLM training reports, with
  * `k` as the gram order).
  *
  * Scale shape: the benchmark gram set is distinct-reduced and explicitly
  * broadcast — eval sets are small by definition (thousands of docs)
  * while the training corpus is the 100 TB side, so the corpus-side scan
  * is one pass with a map-side hash-join probe and its only shuffle is
  * the per-doc count aggregation keyed by doc id. Only (id, 8-byte gram
  * hash) ever crosses the wire — gram text stays in the scan stage, the
  * same fingerprint-not-payload discipline as q23/q35. Grams are hashed
  * with xxhash64 (seed 0): distinct-hash counts equal distinct-gram
  * counts absent a 64-bit collision (~1e-6 at billions of grams —
  * accepted and documented, as in q35).
  */
object Contamination {

  /** Per-training-doc contamination profile against `bench`:
    * (id, n_grams, n_contaminated, contam_frac, contaminated) where
    * n_grams counts the doc's distinct word k-grams and n_contaminated
    * those also present anywhere in the benchmark set. Every training
    * doc appears exactly once, including gram-less (< k words) docs. */
  def ngramOverlap(
      train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val grams = MinHashLsh.shingles(col(textCol), k)
    val benchGrams = bench
      .select(explode(grams).as("__gram"))
      .select(Hashes.xxhash64Seed0(col("__gram")).as("__g"))
      .distinct()
    val trainGrams = train
      .select(col(idCol), explode(grams).as("__gram"))
      .select(col(idCol), Hashes.xxhash64Seed0(col("__gram")).as("__g"))
    // WordShingles output is already distinct per doc, so a plain count
    // after the probe IS the distinct-shared-gram count — no countDistinct
    val hits = trainGrams
      .join(broadcast(benchGrams), "__g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__n_hit"))
    // null text → null gram array → size() null: coalesce so gram-less
    // and null-text docs share the documented n_grams=0 contract (and
    // contam_frac=0.0, not NULL — a NULL frac would slip through
    // n_contaminated===0 style filters downstream)
    train
      .select(col(idCol),
        coalesce(size(grams).cast("long"), lit(0L)).as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("__n_hit"), lit(0L)).as("n_contaminated"))
      .withColumn("contam_frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(round(
            col("n_contaminated").cast("double") / col("n_grams"), 6)))
      .withColumn("contaminated", col("n_contaminated") >= 1)
  }
}
