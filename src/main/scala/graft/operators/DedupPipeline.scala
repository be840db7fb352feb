package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** The end-to-end corpus-dedup stage a training-data pipeline actually
  * ships: exact duplicates first (cheap, hash-grouped), then near-dup
  * clusters over the exact survivors (MinHash-LSH pairs → connected
  * components), one verdict row per input document.
  *
  * Stage order matters at scale: exact dedup collapses identical bodies
  * with ONE fingerprint-keyed shuffle (map-side partial aggregation —
  * duplicate bodies combine before the wire) BEFORE the LSH pipeline
  * runs, so the expensive shingle→signature scan sees each distinct body
  * once. Within the near stage everything inherits the q18/q32 shapes:
  * one (band, bucket, id) shuffle, text joined for candidates only, the
  * component labels are (id, id) longs. The exact-survivor set is
  * localCheckpointed because the near stage consumes it three times
  * (signature scan + two candidate text joins) — at warehouse scale this
  * materialization is the standard "write the survivors once, then run
  * near-dedup over them" step.
  */
object DedupPipeline {

  /** (id, stage, kept) for every doc in `docs`: stage ∈ 'exact_dup'
    * (an identical body with a smaller id exists), 'near_dup' (its
    * near-dup component has a smaller-id representative), 'kept'.
    * Exact equality is on lower(trim(text)) fingerprints; near-dup is
    * shingle-Jaccard ≥ `minJaccard` blocked by banded MinHash-LSH. */
  def corpusVerdict(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 32,
      minJaccard: Double = 0.8): DataFrame = {
    val withFp = docs.select(col(idCol), col(textCol),
      Hashes.xxhash64Seed0(lower(trim(col(textCol)))).as("__fp"))
    // ONE corpus shuffle for the exact stage: fingerprint groups hold
    // NORMALIZED-equal bodies, so the min-id doc's raw text is the
    // representative and no join-back is needed — exact_dup docs are
    // simply those whose id is not the group min, recovered id-only at
    // verdict time. min_by (not first): group members can differ in
    // case/padding, and a nondeterministic first() would feed the
    // case-sensitive near stage different grams run to run.
    val reps = withFp.groupBy("__fp")
      .agg(min(col(idCol)).as(idCol),
        min_by(col(textCol), col(idCol)).as(textCol))
      .select(col(idCol), col(textCol))
      .localCheckpoint()
    val pairs = MinHashLsh.nearDupPairs(reps, idCol, textCol,
      shingleK, numHashes, bands, minJaccard)
    val nearDropped = ClusterDedup.clusterReps(pairs.select("id_a", "id_b"))
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as(idCol), lit(true).as("__near"))
    docs.select(col(idCol))
      .join(reps.select(col(idCol), lit(true).as("__isrep")), Seq(idCol), "left")
      .join(nearDropped, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__isrep").isNull, "exact_dup")
          .when(col("__near").isNotNull, "near_dup")
          .otherwise("kept").as("stage"))
      .withColumn("kept", col("stage") === "kept")
  }
}
