package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Semantic deduplication over an embedding column — the SemDeDup shape
  * (Abbas et al. 2023, arXiv:2303.09540): k-means the corpus into
  * cells, scan each cell's quadratic pair space for cosine ≥ `minCos`,
  * connected-component the hits, keep the min-id representative per
  * component. No reference analog; part of the LLM-pipeline extension
  * surface next to the text-side dedup family (exact / MinHash /
  * SimHash / winnowing / exact-Jaccard).
  *
  * Scale shape: clustering IS the blocking scheme — all-pairs cosine is
  * impossible at 100 TB, so pairs are only scanned within a cell. The
  * corpus is scanned once for assignment (a pure map: centroids are a
  * plan-time constant, [[Ann.trainCentroids]] trains on a bounded
  * deterministic sample); the ONE corpus-wide shuffle carries
  * (cell, id, vec) rows into per-cell groups, where a lazy fused
  * generator ([[graft.functions.CosinePairs]]) streams verified pairs
  * without materializing the quadratic candidate set — vectors cross
  * the wire once, never per-pair. Components then propagate over
  * (id, id) longs only ([[ClusterDedup]]). `nCells` is the dial that
  * bounds cell population (cells per corpus grows linearly at fixed
  * cell size); duplicates split across a cell boundary are the scheme's
  * documented approximation, exactly as in the paper.
  *
  * CENTROID-CARDINALITY CEILING (r19 stage decomposition): with cell
  * population fixed, `nCells` ∝ N — and the centroid set is a
  * plan-constant literal that every assignment task holds, plus the
  * train's per-sample work is sampleN × nCells distance evaluations.
  * Fine to ~10⁵ cells (the gates run ~10–10² and the r19 stage probe
  * shows the train is job-overhead-bound, not distance-bound); past
  * that the deployment path is HIERARCHICAL, the FAISS IVF trade:
  * ~√N coarse cells trained once, then per-cell subclustering (each
  * coarse cell's members re-clustered independently — an
  * embarrassingly parallel groupBy), so no single centroid table ever
  * exceeds √N and assignment stays two bounded plan-constant maps.
  */
object SemanticDedup {

  /** One verdict row per corpus vector: (vec_id, cell, rep_id, kept) —
    * rep_id is the min id of the vector's in-cell cosine-≥-`minCos`
    * component (itself when it has no such neighbor), kept ⇔ it is its
    * own representative. The threshold is applied to the µ-rounded
    * cosine (round 6) so decisions match the suite's other cosine
    * operators. Vectors with no defined cosine (empty, null, zero-norm)
    * land in cell -1 and are always kept — no neighbors, and nothing is
    * silently dropped or left with a null cell. */
  def verdicts(
      corpus: DataFrame, idCol: String, vecCol: String,
      minCos: Double = 0.999, nCells: Int = 8,
      iters: Int = 2, sampleN: Int = 2048): DataFrame = {
    val nonEmpty = corpus.filter(size(col(vecCol)) > 0)
    val cents = Ann.trainCentroids(nonEmpty, idCol, vecCol, nCells, iters, sampleN)
    // assignment is a pure map; checkpointed because two consumers
    // (pair scan + verdict spine) would otherwise re-run it
    val assigned = corpus
      .select(col(idCol).cast("long").as("vec_id"),
        Ann.toDoubleArray(col(vecCol)).as("__v"))
      // coalesce, not when/otherwise: NearestCells is null not just for
      // empty vectors but for any vector with no defined cosine to a
      // centroid (zero norm, mismatched dimensionality) — ALL of those
      // must land in cell -1, never a null cell
      .withColumn("cell",
        coalesce(
          when(size(col("__v")) > 0,
            element_at(Ann.nearestCells(col("__v"), cents, 1), 1)),
          lit(-1)))
      .localCheckpoint()
    val pairGen = ColumnBridge.col(graft.functions.CosinePairs(
      ColumnBridge.expr(col("__m")), minCos))
    val pairs = assigned
      // cell -1 members have no defined relationship to ANY centroid and
      // the contract keeps them all; without this filter the -1 group
      // itself would be pair-scanned and could dedup its members (the
      // oracle excludes cell -1 pairs for the same reason)
      .filter(col("cell") =!= -1)
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id"), col("__v"))).as("__m"))
      .select(pairGen.as(Seq("id_a", "id_b", "cos")))
      .withColumn("cos", round(col("cos"), 6))
      .filter(col("cos") >= minCos)
    val comps = ClusterDedup.clusterReps(pairs.select("id_a", "id_b"))
      .withColumnRenamed("doc_id", "vec_id")
    assigned.select("vec_id", "cell")
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("rep_id"), col("vec_id")).as("rep_id"))
      .withColumn("kept", col("rep_id") === col("vec_id"))
  }
}
