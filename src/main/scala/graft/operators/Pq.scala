package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ColumnBridge, PqEncode, PqQueryTables}

/** Product quantization — the memory-compression leg of the ANN family
  * ([[Ann]]: brute force / LSH / IVF; this adds the "corpus too big for
  * float vectors" path). Each vector is unit-normalized, split into `m`
  * subspaces, and each slice replaced by the id of its nearest codeword
  * from a per-subspace codebook of `ksub` centroids: a d-float vector
  * becomes `m` small ints (with `ksub ≤ 256`, m bytes — 16× smaller than
  * 32-dim float32, 512× smaller than a 4 KB document embedding row).
  *
  * At 100 TB the shape is: [[train]] reads a bounded deterministic
  * sample once; [[encode]] is a single corpus scan with the codebooks as
  * plan constants (no shuffle, no state — append-friendly, so a daily
  * crawl encodes only its delta); [[adcTopK]] never touches the float
  * corpus at all — it scans the CODES table, scoring each candidate in
  * `m` array lookups against per-query distance tables that are computed
  * once per query row and broadcast with the (small) query set. Squared
  * L2 on unit vectors is `2 − 2·cos`, so ascending ADC distance ranks
  * like the rest of the cosine-based ANN operators.
  *
  * Codebook training is deliberately driver-side k-means over the same
  * xxhash-ordered `sampleN` sample [[Ann.trainCentroids]] uses — the
  * sample is bounded regardless of corpus size, and sequential
  * accumulation in sample order makes the codebooks bit-reproducible
  * (the distributed-sum alternative trades that for parallelism the
  * bounded sample doesn't need).
  */
object Pq {

  /** `cents(s)(c)` = codeword c of subspace s (each `dsub` wide). */
  case class Codebooks(m: Int, ksub: Int, dsub: Int, cents: Seq[Seq[Seq[Double]]])

  /** Train per-subspace codebooks on a deterministic sample. `dim` must
    * be divisible by `m`. Vectors whose dimensionality differs from the
    * first sampled vector's, and zero-norm vectors, are skipped. */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, ksub: Int = 16, iters: Int = 4,
      sampleN: Int = 2048): Codebooks = {
    require(m > 0 && ksub > 0 && iters >= 0)
    val samp = corpus
      .select(col(idCol).as("__id"), Ann.toDoubleArray(col(vecCol)).as("__v"))
      .orderBy(ColumnBridge.col(new XxHash64(
        Seq(ColumnBridge.expr(col("__id"))), 0x9071L)))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    val dim = samp.headOption.map(_.length).getOrElse(0)
    require(dim > 0 && dim % m == 0,
      s"embedding dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // unit-normalize in sample order; drop zero-norm/mismatched rows
    val unit = samp.iterator
      .filter(v => v.length == dim)
      .flatMap { v =>
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i) * v(i); i += 1 }
        if (s == 0.0) None
        else {
          val inv = 1.0 / math.sqrt(s)
          Some(v.map(_ * inv))
        }
      }.toArray
    require(unit.nonEmpty, "no usable sample vectors")

    val cents = (0 until m).map { s =>
      val off = s * dsub
      val slices = unit.map(v => java.util.Arrays.copyOfRange(v, off, off + dsub))
      kmeans(slices, ksub, iters)
    }
    Codebooks(m, ksub, dsub, cents.map(_.map(_.toSeq).toSeq))
  }

  /** Deterministic Lloyd iterations: init = first `k` DISTINCT slices in
    * sample order (duplicate init centroids would permanently collapse
    * clusters — ties assign low, so the twin never attracts a point),
    * assignment ties to the lowest code, means accumulated sequentially
    * in sample order, empty clusters keep their centroid (the
    * [[Ann.trainCentroids]] rule). */
  private def kmeans(
      xs: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val d = xs(0).length
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var s0 = 0
    while (s0 < xs.length && init.length < k) {
      val x = xs(s0)
      if (!init.exists(c => java.util.Arrays.equals(c, x))) init += x.clone()
      s0 += 1
    }
    var cents = init.toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](d))
      val counts = new Array[Long](cents.length)
      var i = 0
      while (i < xs.length) {
        val x = xs(i)
        // same kernel as PqEncode/PqQueryTables (graft.functions.PqMath)
        // so training, encoding, and scoring can never drift apart
        val best = graft.functions.PqMath.nearestCode(x, 0, cents)
        val acc = sums(best)
        var j = 0
        while (j < d) { acc(j) += x(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0L) cents(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    cents
  }

  /** Encode the corpus: (idCol, codes array<int>). One scan, no shuffle;
    * rows with no defined code (zero norm, wrong dim) are dropped. */
  def encode(
      corpus: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): DataFrame =
    corpus
      .select(col(idCol),
        ColumnBridge.col(PqEncode(
          ColumnBridge.expr(Ann.toDoubleArray(col(vecCol))), cb.cents))
          .as("codes"))
      .filter(col("codes").isNotNull)

  /** ADC approximate top-k of each query against a pre-encoded corpus.
    * Output: (q_id, rank, nn_id, adist) — `adist` is the µ-rounded
    * approximate squared L2 on unit vectors (2 − 2·cos estimate),
    * ascending, id tie-breaks. The query side computes its distance
    * tables map-side and is broadcast; the codes scan composes the
    * score from built-in `zip_with`/`aggregate` — no vector shuffle
    * anywhere. */
  def adcTopK(
      codes: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
        ColumnBridge.col(PqQueryTables(
          ColumnBridge.expr(Ann.toDoubleArray(col(vecCol))), cb.cents))
          .as("__t"))
      .filter(col("__t").isNotNull)
    val scored = codes
      .select(col(idCol).as("nn_id"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("q_id"))
      .withColumn("adist", round(
        aggregate(
          zip_with(col("codes"), col("__t"),
            (c, t) => element_at(t, c + lit(1))),
          lit(0.0d), (acc, x) => acc + x), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("nn_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "nn_id", "adist")
  }
}
