package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Cluster-level dedup over verified near-dup pairs: assign every
  * document in the pair graph its connected component's minimum id as
  * the representative, so a dedup pipeline keeps one doc per near-dup
  * cluster (the first-seen/smallest id) instead of enumerating the
  * cluster's quadratic pair set — the scale escape hatch
  * [[MinHashLsh.candidatePairs]]'s scaladoc promises for mega-clusters.
  *
  * Two execution paths behind one exact semantics:
  *
  *  - **Driver union-find** when the edge count (observed for free on
  *    the pair checkpoint's materialization job) is ≤ `maxDriverEdges`:
  *    the (long, long) edge list — 16 bytes/edge, ≤16 MiB at the 1M
  *    default, the same driver-residency contract as a broadcast-join
  *    build side — collects once and resolves with path-compressed
  *    union-find in O(E α(E)). A verified near-dup pair graph is
  *    result-shaped (orders of magnitude smaller than the corpus), so
  *    this is the common case even at large corpus scale; it exists
  *    because the iterative path's cost is ~all fixed per-round job
  *    latency when the graph is tiny.
  *  - **Iterative min-label propagation** otherwise (the 100 TB path —
  *    a pair graph can exceed any driver bound, e.g. boilerplate
  *    mega-clusters): each round every node takes the min of its own
  *    and its neighbors' labels — one shuffle join + one aggregation
  *    per round over (id, id) longs, never text. Rounds needed = graph
  *    diameter (near-dup clusters are quasi-cliques, diameter 1-2);
  *    `maxIter` bounds the worst case and exiting unconverged THROWS
  *    rather than silently returning wrong components. The loop runs
  *    exactly ONE job per round: the changed-label count rides the
  *    round's checkpoint materialization as an [[Observation]]
  *    (CollectMetrics) instead of a separate action.
  */
object ClusterDedup {

  /** (doc_id, rep_id) for every doc appearing in `pairs` (id_a, id_b).
    * rep_id = min doc_id of the connected component. */
  def clusterReps(
      pairs: DataFrame, maxIter: Int = 10,
      maxDriverEdges: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    // checkpoint the pair list FIRST: every path reads it at least
    // twice, and each propagation round reads the edges again — without
    // the cut, an expensive upstream pipeline (e.g. the whole LSH
    // blocking) would re-execute per consumer. The edge count rides the
    // checkpoint job as an Observation: no separate count() action.
    val cntObs = Observation()
    val p = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .observe(cntObs, count(lit(1)).as("n"))
      .localCheckpoint()
    val nEdges = cntObs.get("n").asInstanceOf[Long]

    if (nEdges <= maxDriverEdges) return driverUnionFind(p)

    // size the loop's partitioning to the GRAPH, not the corpus: the pair
    // list is result-sized, so a near-dup graph usually fits a handful of
    // partitions — running every round's joins at corpus-scale fan-out
    // just multiplies task-scheduling overhead. ~100k edges/partition,
    // capped at the cluster's parallelism for genuinely huge graphs.
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      (nEdges / 100000L).toInt + 1))
    val edges = p
      .unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .coalesce(parts)
      .localCheckpoint()
    // labels init deliberately NOT checkpointed: it derives from the
    // checkpointed edges in one cached-block pass, and round 1's
    // checkpoint pins everything downstream — an extra eager checkpoint
    // here would only add a job to the fixed overhead.
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
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

  /** Exact component representatives for a driver-bounded edge list:
    * union-find with path compression + union by rank, then one pass
    * mapping each root to its component's min id. The collected rows
    * are two longs each — the caller has already proven the count fits
    * the driver bound. */
  private def driverUnionFind(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val edges = p.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    val rank = new java.util.HashMap[Long, Int]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.get(x) != x) {
        val gp = parent.get(parent.get(x))
        parent.put(x, gp) // path halving
        x = gp
      }
      x
    }
    def add(x: Long): Unit =
      if (!parent.containsKey(x)) { parent.put(x, x); rank.put(x, 0) }
    edges.foreach { case (a, b) =>
      add(a); add(b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        val (hi, lo) =
          if (rank.get(ra) >= rank.get(rb)) (ra, rb) else (rb, ra)
        parent.put(lo, hi)
        if (rank.get(ra) == rank.get(rb)) rank.put(hi, rank.get(hi) + 1)
      }
    }
    val minOfRoot = new java.util.HashMap[Long, Long]()
    val nodeIt = parent.keySet().iterator()
    while (nodeIt.hasNext) {
      val n = nodeIt.next()
      val r = find(n)
      val cur = minOfRoot.getOrDefault(r, Long.MaxValue)
      if (n < cur) minOfRoot.put(r, n)
    }
    val out = new Array[(Long, Long)](parent.size())
    var i = 0
    val it2 = parent.keySet().iterator()
    while (it2.hasNext) {
      val n = it2.next()
      out(i) = (n, minOfRoot.get(find(n)))
      i += 1
    }
    spark.createDataset(out.toIndexedSeq).toDF("doc_id", "rep_id")
  }

  /** Keep one representative per cluster: `docs` minus every doc whose
    * cluster rep is a different (smaller) id. Docs in no pair survive. */
  def dedupKeepReps(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val losers = clusterReps(pairs)
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as(s"__loser"))
    docs.join(losers, docs(idCol) === col("__loser"), "left_anti")
  }

  /** QUALITY-AWARE representative selection: keep, per near-dup
    * cluster, the member with the highest `priority` (ties broken by
    * smallest id — fully deterministic), instead of [[dedupKeepReps]]'s
    * arbitrary min-id pick. This is the curation-correct form of
    * cluster dedup for training corpora: when a crawl holds a truncated
    * and a complete copy of the same page, min-id keeps whichever was
    * crawled first; keep-best keeps the longer / higher-quality one.
    * Docs in no pair always survive.
    *
    * Shape: [[clusterReps]]'s component labels (pair-graph-sized, never
    * corpus-sized) pick up each member's priority through one id-keyed
    * join against `docs`; the per-cluster argmax is a window over the
    * MEMBER table partitioned by cluster (bounded by cluster size, the
    * same bound every per-cluster scan here already has), and the
    * survivors come back via one anti-join — `docs` itself is scanned
    * twice and never shuffled on anything but the id. */
  def dedupKeepBest(
      docs: DataFrame, pairs: DataFrame, idCol: String,
      priority: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val members = clusterReps(pairs)
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        priority.as("__pri")), "doc_id")
    val w = Window.partitionBy(col("rep_id"))
      .orderBy(col("__pri").desc, col("doc_id"))
    val losers = members
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(col("doc_id").as("__loser"))
    docs.join(losers, docs(idCol) === col("__loser"), "left_anti")
  }
}
