package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid ("more-like-this") retrieval: fuse a dense (embedding-cosine)
  * ranking and a sparse (lexical word-set Jaccard) ranking with
  * Reciprocal Rank Fusion — the standard RAG-retrieval composition
  * (Cormack et al. 2009: score(d) = Σ_systems 1/(k₀ + rank_s(d))).
  *
  * RRF itself is rank-only, so the fused score is a sum of exact
  * rationals over small integers — bit-deterministic with no float
  * discipline needed; all the float care lives inside the constituent
  * rankers (which µ-round before ranking). A document absent from one
  * system's top-`poolK` contributes nothing for that system (standard
  * pooled-RRF semantics).
  *
  * Scale shape: each ranker is top-`poolK` per query BEFORE fusion, so
  * the fusion join is (queries × poolK)-sized — scale-invariant; the
  * corpus is touched only by the rankers (once each). The seed set is
  * broadcast everywhere.
  */
object HybridRetrieval {

  /** Rank the corpus against each seed doc by word-set Jaccard
    * similarity — exact rational |A∩B| / |A∪B| on distinct whitespace
    * tokens, no floats until the final (exact-input) division. Output:
    * (q_id, rank, doc_id, jac). */
  def jaccardTopK(
      docs: DataFrame, idCol: String, textCol: String,
      seedIds: Seq[Long], poolK: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      array_distinct(split(col(textCol), " ")).as("__w"))
    val seeds = toks.filter(col("doc_id").isInCollection(seedIds))
      .select(col("doc_id").as("q_id"), col("__w").as("__qw"),
        size(col("__w")).cast("long").as("__qn"))
    val scored = toks
      .crossJoin(broadcast(seeds))
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("__inter",
        size(array_intersect(col("__w"), col("__qw"))).cast("long"))
      .withColumn("jac", round(col("__inter").cast("double") /
        (size(col("__w")) + col("__qn") - col("__inter")).cast("double"), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("jac").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= poolK)
      .select("q_id", "rank", "doc_id", "jac")
  }

  /** RRF-fuse any number of (q_id, rank, doc_id) rankings. Output:
    * (q_id, rank, doc_id, rrf_score) — top `k` per query by the fused
    * score, doc_id tie-broken. `k0` is the RRF damping constant
    * (60 in the original paper). The score is kept as an exact
    * micro-rounded sum of 1/(k0+r) doubles: each term is a short
    * rational of ints, identical IEEE on any engine, and the ≤
    * `rankings.size`-term sum is evaluated in system order via a
    * full-outer cascade — order fixed, not commutative-reassociated. */
  def rrf(
      rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val terms = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("q_id"), col("doc_id"),
        (lit(1.0d) / (lit(k0).cast("double") + col("rank").cast("double")))
          .as(s"__t$i"))
    }
    val joined = terms.reduce { (a, b) =>
      a.join(b, Seq("q_id", "doc_id"), "full_outer")
    }
    val score = terms.indices
      .map(i => coalesce(col(s"__t$i"), lit(0.0d)))
      .reduceLeft[Column](_ + _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    joined
      .withColumn("rrf_score", round(score, 9))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "doc_id", "rrf_score")
  }

  /** The full hybrid: dense = exact cosine over `vecs` (joined to docs
    * by id), sparse = word-set Jaccard over `docs`; both pooled at
    * `poolK`, RRF-fused to top `k`. Output: (q_id, rank, doc_id,
    * rrf_score). */
  def moreLikeThis(
      docs: DataFrame, docIdCol: String, textCol: String,
      vecs: DataFrame, vecIdCol: String, vecCol: String,
      seedIds: Seq[Long], k: Int, poolK: Int): DataFrame = {
    val dense = Ann.bruteForceTopK(
        vecs, vecs.filter(col(vecIdCol).isInCollection(seedIds)),
        vecIdCol, vecCol, poolK)
      .select(col("q_id"), col("rank"), col("nn_id").as("doc_id"))
    val sparse = jaccardTopK(docs, docIdCol, textCol, seedIds, poolK)
      .select("q_id", "rank", "doc_id")
    rrf(Seq(dense, sparse), k)
  }
}
