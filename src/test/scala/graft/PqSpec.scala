package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pq}

/** Product-quantization semantics: code determinism and range, ADC
  * distance against hand-computed tables, degenerate-input handling,
  * and recall@10 vs the exact cosine baseline on the sf0.001
  * embeddings table. */
class PqSpec extends SparkSuite {

  test("encode: orthogonal cluster axes quantize to distinct codes, ties low") {
    import spark.implicits._
    // 4-dim, m=2 subspaces of dsub=2; vectors live exactly on codewords
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (4L, Seq(0.0f, 1.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, iters = 4, sampleN = 4)
    assert(cb.m === 2 && cb.dsub === 2 && cb.cents.forall(_.size <= 2))
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes.size === 4)
    // same subvector ⇒ same code; different subvector ⇒ different code
    // (all four subspace slices sit exactly on trained codewords here)
    assert(codes(1L)(0) === codes(3L)(0))
    assert(codes(2L)(0) === codes(4L)(0))
    assert(codes(1L)(0) !== codes(2L)(0))
    assert(codes(1L)(1) === codes(2L)(1))
    assert(codes(3L)(1) === codes(4L)(1))
    assert(codes(1L)(1) !== codes(3L)(1))
  }

  test("encode drops zero-norm and wrong-dimension vectors") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),  // zero norm
      (3L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding") // wrong dim
    val cb = Pq.train(corpus.filter(col("vec_id") === 1), "vec_id",
      "embedding", m = 2, ksub = 1, iters = 1, sampleN = 4)
    val kept = Pq.encode(corpus, "vec_id", "embedding", cb)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("adcTopK: a vector's planted same-direction twin ranks first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),  // same direction as 1
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 4, sampleN = 4)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
    val top = Pq.adcTopK(codes, corpus.filter(col("vec_id") === 1),
        "vec_id", "embedding", cb, k = 3)
      .orderBy("rank").collect()
    assert(top.head.getLong(2) === 2L)     // unit-normalized twin: adist 0
    assert(top.head.getDouble(3) === 0.0)
  }

  test("shortlist+rerank recall@10 vs exact cosine baseline on real embeddings") {
    // the deployment shape (q67): ADC shortlists candidates from CODES
    // only, exact cosine reranks the shortlist — recall is a property of
    // the shortlist, not of raw ADC ranking (whose quantization noise on
    // clusterless 32-dim synthetic data is the expected PQ behavior)
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 16)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val short = Pq.adcTopK(codes, queries, "vec_id", "embedding", cb, 64)
      .select("q_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & short).size.toDouble / exact.size
    info(s"PQ shortlist-64 recall of exact top-10 = $recall " +
      s"(scanned m=16 int codes, never the float corpus)")
    assert(recall >= 0.6, s"shortlist recall $recall too low")
  }

  test("train is deterministic across invocations") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Pq.train(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val b = Pq.train(emb, "vec_id", "embedding", m = 4, ksub = 8)
    assert(a === b)
  }
}
