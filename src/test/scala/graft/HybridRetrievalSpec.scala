package graft

import org.apache.spark.sql.functions._

import graft.operators.HybridRetrieval

class HybridRetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def ranking(rows: Seq[(Long, Int, Long)]) =
    rows.toDF("q_id", "rank", "doc_id")

  test("rrf: doc in both systems outscores single-system docs") {
    val dense = ranking(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val sparse = ranking(Seq((1L, 1, 11L), (1L, 2, 13L)))
    val got = HybridRetrieval.rrf(Seq(dense, sparse), k = 10)
      .select("doc_id", "rank", "rrf_score")
      .as[(Long, Int, Double)].collect().sortBy(_._2)
    // doc 11: 1/62 + 1/61 beats doc 10's 1/61 alone
    assert(got.head._1 === 11L)
    val expected11 = math.rint((1.0 / 62 + 1.0 / 61) * 1e9) / 1e9
    assert(got.head._3 === expected11)
    assert(got.map(_._1).toSeq === Seq(11L, 10L, 13L, 12L))
  }

  test("rrf: equal scores tie-break by doc_id") {
    val dense = ranking(Seq((1L, 1, 20L), (1L, 2, 5L)))
    val sparse = ranking(Seq((1L, 1, 7L), (1L, 2, 30L)))
    val got = HybridRetrieval.rrf(Seq(dense, sparse), k = 10)
      .select("doc_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    // 7 and 20 both score 1/61; 5 and 30 both 1/62 — ids break ties
    assert(got.map(_._1).toSeq === Seq(7L, 20L, 5L, 30L))
  }

  test("rrf: k truncates per query independently") {
    val dense = ranking(
      (1 to 5).map(r => (1L, r, 100L + r)) ++
        (1 to 3).map(r => (2L, r, 200L + r)))
    val got = HybridRetrieval.rrf(Seq(dense), k = 2)
      .select("q_id", "rank", "doc_id").as[(Long, Int, Long)].collect()
    assert(got.count(_._1 == 1L) === 2)
    assert(got.count(_._1 == 2L) === 2)
    assert(got.filter(_._1 == 1L).map(_._3).sorted.toSeq === Seq(101L, 102L))
  }

  test("jaccardTopK: exact rational similarity, seeds excluded") {
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c d"),     // jac 1 with seed 0
      (2L, "a b x y"),     // 2/6
      (3L, "p q r"))       // 0
      .toDF("doc_id", "text")
    val got = HybridRetrieval
      .jaccardTopK(docs, "doc_id", "text", Seq(0L), poolK = 10)
      .select("rank", "doc_id", "jac").as[(Int, Long, Double)]
      .collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L))
    assert(got(0)._3 === 1.0)
    assert(got(1)._3 === math.rint(2.0 / 6.0 * 1e6) / 1e6)
    assert(got(2)._3 === 0.0)
  }

  test("jaccardTopK: duplicate tokens count once") {
    val docs = Seq((0L, "a a a b"), (1L, "a b b b")).toDF("doc_id", "text")
    val got = HybridRetrieval
      .jaccardTopK(docs, "doc_id", "text", Seq(0L), poolK = 10)
      .select("jac").as[Double].collect()
    assert(got.toSeq === Seq(1.0)) // both are {a, b}
  }

  test("moreLikeThis: fused output is top-k with both signals live") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),  // lexical twin of 0
      (2L, "delta epsilon zeta"),
      (3L, "alpha beta zeta"))
      .toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),     // orthogonal to 0
      (2L, Seq(1.0f, 0.1f)),     // dense twin of 0
      (3L, Seq(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val got = HybridRetrieval.moreLikeThis(
        docs, "doc_id", "text", vecs, "vec_id", "embedding",
        Seq(0L), k = 3, poolK = 3)
      .select("rank", "doc_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.length === 3)
    // doc 1: lexical rank 1, dense rank 3 → 1/61+1/63; doc 2: dense
    // rank 1, lexical rank 3 → the same 1/63+1/61; doc 3: rank 2 in
    // both → 2/62, which is SMALLER (convexity of 1/x). The 1-vs-2 tie
    // breaks by doc_id.
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L))
  }
}
