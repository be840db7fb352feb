package graft

import graft.operators.Bm25

/** BM25 golden scores on a hand-checkable corpus plus ranking
  * invariants. */
class Bm25Spec extends SparkSuite {

  private val k1 = 1.2
  private val b = 0.75

  // the operator's exact formula, for golden expectations
  private def idf(n: Long, df: Long): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)
  private def term(tf: Long, dfv: Long, n: Long, dl: Long, avgdl: Double): Double =
    idf(n, dfv) * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))

  test("golden: scores match the Okapi formula, ranking is score-desc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"),
      (2L, "a c"),
      (3L, "c c c")).toDF("doc_id", "text")
    val queries = Seq((0, "a c")).toDF("q_id", "q_text")
    val out = Bm25.search(docs, "doc_id", "text",
        queries, "q_id", "q_text", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val n = 3L; val avgdl = 8.0 / 3.0
    val exp = Map(
      1L -> term(2, 2, n, 3, avgdl),            // 'a' twice, no 'c'
      2L -> (term(1, 2, n, 2, avgdl) + term(1, 2, n, 2, avgdl)),
      3L -> term(3, 2, n, 3, avgdl))            // 'c' three times
    assert(out.length === 3)
    out.foreach { case (q, _, id, score) =>
      assert(q === 0)
      assert(math.abs(score - exp(id)) < 1e-6, s"doc $id")
    }
    // d2 matches both terms once; d1/d3 match one term with higher tf —
    // assert the ranking follows the computed scores, not match count
    val expectedOrder = exp.toSeq.sortBy { case (id, s) =>
      (-math.rint(s * 1e6) / 1e6, id)
    }.map(_._1)
    assert(out.map(_._3).toSeq === expectedOrder)
  }

  test("invariants: unmatched docs absent, k truncates, ties break by doc_id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "z z")).toDF("doc_id", "text")
    val queries = Seq((7, "x")).toDF("q_id", "q_text")
    val out = Bm25.search(docs, "doc_id", "text",
        queries, "q_id", "q_text", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // docs 1-3 are identical → identical scores; doc 4 never matches;
    // k=2 keeps the two smallest ids of the tie
    assert(out.map(_._2).toSeq === Seq(1L, 2L))
    assert(out(0)._3 === out(1)._3)
  }

  test("persisted inverted index: searchIndex == search, scan prunes buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("scan", "join", "hash", "sort", "merge", "batch",
      "row", "filter", "agg", "window", "query", "dup")
    val docs = (1L to 200L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val queries = Seq((0, "hash join"), (1, "dup sort scan")).toDF("q_id", "q_text")
    val path = java.nio.file.Files
      .createTempDirectory("bm25idx").toString
    graft.operators.Bm25.writeIndex(docs, "doc_id", "text", path, nBuckets = 16)
    val direct = Bm25.search(docs, "doc_id", "text",
      queries, "q_id", "q_text", k = 10)
    val viaIndex = Bm25.searchIndex(spark, path,
      queries, "q_id", "q_text", k = 10)
    val a = direct.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val bst = viaIndex.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === bst)
    // the postings scan must carry a NON-EMPTY bucket partition filter
    // (every scan prints "PartitionFilters: [...]", so a contains check
    // on the label alone would pass with zero pruning)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*__bucket[^\\]]*\\]".r
        .findFirstIn(plan).isDefined,
      s"no non-empty __bucket partition filter in:\n$plan")
  }

  test("duplicate query terms count once") {
    import spark.implicits._
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val once = Bm25.search(docs, "doc_id", "text",
      Seq((0, "a")).toDF("q_id", "q_text"), "q_id", "q_text", k = 5).collect()
    val twice = Bm25.search(docs, "doc_id", "text",
      Seq((0, "a a")).toDF("q_id", "q_text"), "q_id", "q_text", k = 5).collect()
    assert(once.map(_.getDouble(3)).toSeq === twice.map(_.getDouble(3)).toSeq)
  }
}
