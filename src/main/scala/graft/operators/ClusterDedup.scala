package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Cluster-level dedup over verified near-dup pairs: assign every
  * document in the pair graph its connected component's minimum id as
  * the representative, so a dedup pipeline keeps one doc per near-dup
  * cluster (the first-seen/smallest id) instead of enumerating the
  * cluster's quadratic pair set — the scale escape hatch
  * [[MinHashLsh.candidatePairs]]'s scaladoc promises for mega-clusters.
  *
  * Implementation is iterative min-label propagation: each round every
  * node takes the min of its own label and its neighbors' labels — one
  * shuffle join + one aggregation per round, label table is (id, id)
  * longs (never text). Rounds needed = graph diameter, and near-dup
  * clusters are quasi-cliques (diameter 1-2; a pathological chain of
  * length d needs ~log2(d) doubling… this simple propagation needs d —
  * acceptable because LSH blocking produces dense clusters, and
  * `maxIter` bounds the worst case; exiting unconverged THROWS rather
  * than silently returning wrong components). The driver-side loop runs
  * exactly ONE job per round: the changed-label count rides the round's
  * checkpoint materialization as a [[Observation]] (CollectMetrics)
  * instead of a separate action, so driver round-trip latency — the
  * dominant cost when the graph is tiny — is halved; the corpus itself
  * is never involved, only pair ids.
  */
object ClusterDedup {

  /** (doc_id, rep_id) for every doc appearing in `pairs` (id_a, id_b).
    * rep_id = min doc_id of the connected component. */
  def clusterReps(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // checkpoint the pair list FIRST: the union reads it twice and each
    // propagation round reads the edges again — without the cut, an
    // expensive upstream pipeline (e.g. the whole LSH blocking) would
    // re-execute 2 + 2·rounds times
    val p = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .localCheckpoint()
    // size the loop's partitioning to the GRAPH, not the corpus: the pair
    // list is result-sized, so a near-dup graph usually fits a handful of
    // partitions — running every round's joins at corpus-scale fan-out
    // just multiplies task-scheduling overhead. ~100k edges/partition,
    // capped at the cluster's parallelism for genuinely huge graphs.
    // (p is already materialized, so the count is a cached-block scan.)
    val parts = math.max(1, math.min(
      p.sparkSession.sparkContext.defaultParallelism,
      (p.count() / 100000L).toInt + 1))
    val edges = p
      .unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .coalesce(parts)
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("lab")).as("nmin"))
      // the changed count is observed DURING the checkpoint job
      // (Dataset.checkpoint runs through withAction, so the
      // CollectMetrics observation fires) — zero extra actions per round
      val obs = Observation()
      val next = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lab"), coalesce(col("nmin"), col("lab"))).as("lab"),
          (col("nmin") < col("lab")).as("__changed"))
        .observe(obs, coalesce(
          sum(when(col("__changed"), 1L).otherwise(0L)), lit(0L)).as("n"))
        .localCheckpoint()
      converged = obs.get("n").asInstanceOf[Long] == 0L
      labels = next.drop("__changed")
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ClusterDedup.clusterReps did not converge in maxIter=$maxIter rounds: " +
        "the pair graph has a component of diameter > maxIter (min-label " +
        "propagation needs diameter rounds). Raise maxIter — returning the " +
        "partial labels would silently assign wrong representatives.")
    labels.select(col("node").as("doc_id"), col("lab").as("rep_id"))
  }

  /** Keep one representative per cluster: `docs` minus every doc whose
    * cluster rep is a different (smaller) id. Docs in no pair survive. */
  def dedupKeepReps(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val losers = clusterReps(pairs)
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as(s"__loser"))
    docs.join(losers, docs(idCol) === col("__loser"), "left_anti")
  }
}
