package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** ANN operator semantics: exact cosine math, brute-force top-k, and the
  * LSH-bucketed path's recall against the exact baseline on the sf0.001
  * embeddings table.
  */
class AnnSpec extends SparkSuite {

  test("cosine of known vectors") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(1.0, 2.0), Seq(2.0, 4.0), 1.0),
      (Seq(3.0, 4.0), Seq(4.0, 3.0), 24.0 / 25.0))
      .toDF("a", "b", "expected")
    val got = df.select(round(Ann.cosine(col("a"), col("b")), 9).as("c"),
      col("expected")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1e-9))
  }

  test("bruteForceTopK: rank 1 of a planted duplicate is the duplicate") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f)), // same direction as 1
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.7f, 0.7f, 0.0f))).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 3).orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq === Seq(2L, 4L, 3L))
    assert(top.head.getDouble(3) === 1.0)
  }

  test("lshTopK achieves high recall@10 vs brute force on real embeddings") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, queries, "vec_id", "embedding", 10,
        nPlanes = 16, bandBits = 2)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"recall@10 = $recall (candidates examined ≪ corpus)")
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("nearestCells: picks the right centroids, ties to lower index") {
    import spark.implicits._
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val df = Seq(
      (1L, Seq(2.0, 0.1)),  // nearest: cell 0 (tie with 2 → lower index)
      (2L, Seq(0.1, 3.0))). // nearest: cell 1
      toDF("id", "v")
    val got = df.select(col("id"), Ann.nearestCells(col("v"), cents, 2).as("p"))
      .orderBy("id").collect().map(_.getSeq[Int](1).toSeq)
    assert(got(0) === Seq(0, 2))
    assert(got(1) === Seq(1, 0))
  }

  test("nearestCells: dimension-mismatched centroids are never probed") {
    import spark.implicits._
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0)) // first is 3-dim
    val df = Seq((1L, Seq(3.0, 4.0))).toDF("id", "v")
    val got = df.select(Ann.nearestCells(col("v"), cents, 2).as("p"))
      .head().getSeq[Int](0).toSeq
    assert(got === Seq(1)) // only the 2-dim centroid is probe-able
    val none = df.select(
      Ann.nearestCells(col("v"), Seq(Seq(1.0, 0.0, 0.0)), 1).as("p"))
      .head()
    assert(none.isNullAt(0)) // no compatible centroid → null, not a crash
  }

  test("trainCentroids is deterministic and returns nCells vectors") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Ann.trainCentroids(emb, "vec_id", "embedding", nCells = 8,
      iters = 2, sampleN = 256)
    val b = Ann.trainCentroids(emb, "vec_id", "embedding", nCells = 8,
      iters = 2, sampleN = 256)
    assert(a.size === 8)
    assert(a === b)
  }

  test("ivfTopK achieves high recall@10 vs brute force on real embeddings") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // The synthetic embeddings are near-uniform (no cluster structure),
    // the worst case for a coarse quantizer — real-world embedding
    // corpora cluster and probe far fewer cells for the same recall.
    val approx = Ann.ivfTopK(emb, queries, "vec_id", "embedding", 10,
        nCells = 16, nProbe = 8)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall (probed 8/16 cells)")
    assert(recall >= 0.7, s"recall $recall too low")
  }

  test("embedNearDupLsh: scaled copies share every band (exact-FP sign preservation)") {
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val scaled = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * 2).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(scaled)
    val pairs = Ann.embedNearDupLsh(corpus, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = emb.count()
    // every (v, 2v) pair found with cosine exactly 1.0, nothing else
    assert(pairs.length === n)
    assert(pairs.forall { case (a, b, c) => b == a + 1000000L && c === 1.0 })
  }

  test("persisted IVF index: search equals one-shot ivfTopK and prunes partitions") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString

    Ann.writeIvfIndex(emb, "vec_id", "embedding", path, nCells = 16)
    // 16 cell directories on disk
    val cellDirs = new java.io.File(s"$path/data").listFiles()
      .filter(_.getName.startsWith("__cell=")).map(_.getName).toSet
    assert(cellDirs.size === 16)

    val viaIndex = Ann.searchIvfIndex(spark, path, queries,
      "vec_id", "embedding", k = 10, nProbe = 8)
    // training is deterministic (seeded hash-ordered sample, decimal
    // means) → the stored index must reproduce the one-shot results
    val oneShot = Ann.ivfTopK(emb, queries, "vec_id", "embedding", 10,
      nCells = 16, nProbe = 8)
    assert(viaIndex.collect().map(_.toSeq).toSet ===
      oneShot.collect().map(_.toSeq).toSet)

    // the scan must carry a NON-EMPTY probe-set partition filter: only
    // the probed cells' directories are read, nProbe/nCells of the data
    // (every scan prints "PartitionFilters: [...]", so a contains check
    // on the label alone would pass with zero pruning)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*__cell[^\\]]*\\]".r
        .findFirstIn(plan).isDefined,
      s"no non-empty __cell partition filter in:\n$plan")
  }

  test("hardNegatives: near-duplicate band excluded, then exact top-k") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),          // anchor
      (1L, Seq(1.0f, 0.001f)),        // near-dup (cos ≈ 1) — excluded
      (2L, Seq(0.9f, 0.4f)),          // hard negative
      (3L, Seq(0.5f, 0.8f)),          // medium
      (4L, Seq(-1.0f, 0.0f)))         // easy
      .toDF("vec_id", "embedding")
    val got = Ann.hardNegatives(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 2, maxCos = 0.99)
      .select("rank", "neg_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(2L, 3L))
    // the band is a strict upper cut on the µ-rounded cosine
    val all = Ann.hardNegatives(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 10, maxCos = 1.1)
      .select("neg_id").as[Long].collect().toSet
    assert(all === Set(1L, 2L, 3L, 4L))
  }
}
