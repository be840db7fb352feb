package graft

import org.apache.spark.sql.functions._

import graft.operators.ClusterDedup

/** Connected-component representative assignment over near-dup pairs. */
class ClusterDedupSpec extends SparkSuite {

  test("clusters resolve to their min id; disjoint clusters stay separate") {
    import spark.implicits._
    // {1,2,3} via chain, {5,6} via one pair, 9-10-11 triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 10L), (10L, 11L), (9L, 11L))
      .toDF("id_a", "id_b")
    val reps = ClusterDedup.clusterReps(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reps === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L,
      9L -> 9L, 10L -> 9L, 11L -> 9L))
  }

  test("long chain converges within maxIter (diameter bound, loop path)") {
    import spark.implicits._
    // path graph 100-101-...-107: diameter 7. maxDriverEdges=0 forces
    // the distributed propagation loop (the driver fast path would
    // otherwise take every test-sized graph).
    val pairs = (100L until 107L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val reps = ClusterDedup
      .clusterReps(pairs, maxIter = 10, maxDriverEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(reps.forall(_._2 == 100L), s"chain did not converge: ${reps.toSeq}")
  }

  test("a component of diameter > maxIter throws instead of returning wrong labels") {
    import spark.implicits._
    // path graph of diameter 8: min-label propagation needs 8 rounds,
    // so maxIter=3 must fail LOUDLY — the old code silently returned
    // partially-propagated (wrong) representatives here
    val pairs = (200L until 208L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      ClusterDedup.clusterReps(pairs, maxIter = 3, maxDriverEdges = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("driver union-find path ≡ distributed loop path on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 3) {
      // random graph over a sparse id domain: mixes singleton pairs,
      // chains, and dense mini-cliques
      val ids = (0 until 60).map(_ => rnd.nextInt(40).toLong * 7L)
      val pairs = (0 until 80)
        .map(_ => (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val fast = ClusterDedup.clusterReps(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val loop = ClusterDedup
        .clusterReps(pairs, maxIter = 64, maxDriverEdges = 0L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(fast === loop, s"trial=$trial")
    }
  }

  test("empty pair set yields an empty rep table without looping") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ClusterDedup.clusterReps(pairs).count() === 0L)
  }

  test("dedupKeepReps keeps one doc per cluster plus all unpaired docs") {
    import spark.implicits._
    val docs = (1L to 7L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = ClusterDedup.dedupKeepReps(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 2,3 fold into 1; 6 folds into 5; 4 and 7 were never paired
    assert(kept === Seq(1L, 4L, 5L, 7L))
  }

  test("dedupKeepBest keeps the highest-priority member, ties to min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cluster {1,2,3}: 2 has the best quality; cluster {5,6}: tie on
    // quality → 5 (smaller id) wins; 4 and 7 unpaired survive
    val docs = Seq((1L, 10), (2L, 99), (3L, 50), (4L, 1), (5L, 7),
      (6L, 7), (7L, 2)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = ClusterDedup.dedupKeepBest(docs, pairs, "doc_id", col("q"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 4L, 5L, 7L))
  }

  test("dedupKeepBest matches a union-find keep-best model on random graphs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(105)
    for (trial <- 1 to 5) {
      val n = 50
      val pri = (0L until n).map(i => i -> rnd.nextInt(20)).toMap
      val edges = (0 until 60)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver model: union-find, then per-root argmax (pri desc, id asc)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val losers = members.groupBy(find)
        .values.flatMap { ms =>
          val best = ms.minBy(m => (-pri(m), m))
          ms.filterNot(_ == best)
        }.toSet
      val want = (0L until n).filterNot(losers).sorted
      val got = ClusterDedup.dedupKeepBest(
          (0L until n).map(i => (i, pri(i))).toDF("doc_id", "q"),
          edges.toDF("id_a", "id_b"), "doc_id", col("q"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got === want, s"trial=$trial")
    }
  }
}
