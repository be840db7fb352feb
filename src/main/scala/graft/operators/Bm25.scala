package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked text retrieval (Robertson/Spärck Jones Okapi BM25, the
  * Lucene `+1` idf form so every term contributes a positive score):
  * `score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`,
  * `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`. No reference analog;
  * the ranked-retrieval member of the LLM-pipeline extension surface
  * next to ANN (q19/q28) — lexical search over the corpus where ANN is
  * semantic search over embeddings.
  *
  * Scale shape: the query set broadcasts (it is small by contract), so
  * term matching is a map-side hash probe on the exploded corpus token
  * stream — the corpus is scanned once and NEVER shuffled at token
  * width: the only shuffles carry (q_id, term, doc_id) rows for
  * MATCHED tokens only (proportional to query-term hits, not corpus
  * size), then doc-keyed aggregates. Document length rides the token
  * rows (constant per doc) so scoring needs no corpus-wide dl join; the
  * 1-row stats frame (N, avgdl) re-enters as a broadcast, and the
  * matched tf aggregate is checkpointed once for its two consumers (df
  * + scoring) — the corpus text is tokenized exactly twice (stats +
  * matching), independent of consumer count. Per-term scores are
  * accumulated in DECIMAL so the final score is partition-order
  * independent (and agrees with the SQL oracle regardless of each
  * engine's libm `ln` ulp). For a repeated-query workload at 100 TB the
  * (term, doc_id, tf) aggregate is the inverted index — persist it
  * partitioned by term hash and this plan's probe side reads only the
  * query terms' partitions, exactly like [[Ann.writeIvfIndex]]'s
  * probed-cell reads.
  */
object Bm25 {

  /** Top-`k` docs per query: (q_id, rank, doc_id, score). `queries` is
    * (qIdCol, qTextCol) with whitespace-tokenized text; duplicate terms
    * in a query count once (standard bag-of-terms query semantics).
    * Scores are µ-rounded (6) before ranking with doc_id tie-breaks, so
    * the ranking is stable across summation environments. */
  def search(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("__ws"))
    val stats = toks
      .select(size(col("__ws")).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val qterms = queries.select(col(qIdCol).as("q_id"),
      explode(array_distinct(split(col(qTextCol), " "))).as("__term"))
    // dl rides the token rows (8 bytes, constant per doc) so scoring
    // needs no corpus-wide dl join; tf is localCheckpointed because two
    // consumers (df + scoring) would otherwise each re-run the corpus
    // token scan — with the cut, the text is tokenized exactly twice
    // (stats + here), never per consumer
    val tf = toks
      .select(col("doc_id"), size(col("__ws")).cast("long").as("__dl"),
        explode(col("__ws")).as("__term"))
      .join(broadcast(qterms), "__term")
      .groupBy("q_id", "__term", "doc_id")
      .agg(count(lit(1)).as("__tf"), first(col("__dl")).as("__dl"))
      .localCheckpoint()
    // df is per (q_id, term) over matched docs — query-term-sized, broadcast back
    val df = tf.groupBy("q_id", "__term").agg(count(lit(1)).as("__df"))
    val termScore = tf
      .join(broadcast(df), Seq("q_id", "__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__s", termScoreCol(k1, b))
    rankTopK(termScore, k)
  }

  /** Shared scoring tail: per-doc DECIMAL-accumulated score → per-query
    * window top-k on the rounded score with doc_id tie-breaks. */
  private def rankTopK(termScore: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    termScore
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("__s")).cast("double"), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "doc_id", "score")
  }

  private def termScoreCol(k1: Double, b: Double) =
    (log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0) *
      (col("__tf") * (k1 + 1)) /
      // operand order mirrors the oracle's `0.25 + 0.75 * dl / avgdl`
      // exactly: (b*dl) is computed first (one rounding fewer than
      // dl/avgdl*b), so both sides round identically on knife-edge rows
      (col("__tf") + (lit(b) * col("__dl") / col("__avgdl") + (1 - b)) * k1))
      .cast("decimal(28,12)")

  /** Persist the corpus as a BM25 inverted index — the repeated-query
    * deployment shape at 100 TB ([[Ann.writeIvfIndex]]'s pattern for
    * lexical search): postings (term, doc_id, tf, dl) land
    * parquet-partitioned by a bounded term-hash bucket (a directory per
    * bucket, `nBuckets` bounds the directory count no matter the
    * vocabulary), and the 1-row corpus stats (N, avgdl) store
    * alongside. Indexing cost = the same one token scan + one matched
    * shuffle as a single [[search]], paid once. */
  def writeIndex(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      nBuckets: Int = 64): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("__ws"))
    // nBuckets stores WITH the index: a reader guessing a different
    // bucket count would prune to the wrong directories and silently
    // lose postings — the index must be self-describing
    toks.select(size(col("__ws")).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
      .withColumn("__nbuckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    toks
      .select(col("doc_id"), size(col("__ws")).cast("long").as("__dl"),
        explode(col("__ws")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("__dl")).as("dl"))
      .withColumn("__bucket",
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .write.partitionBy("__bucket").mode("overwrite")
      .parquet(s"$path/postings")
  }

  /** Search a persisted index. The bucket count comes from the index's
    * own stats (never a caller guess — a mismatched count would prune
    * to the wrong directories and silently lose postings); the query
    * terms' hash buckets are resolved driver-side into a LITERAL
    * `__bucket IN (…)` predicate, so Catalyst prunes every other
    * postings directory before any I/O (`PartitionFilters` on the scan
    * — Bm25Spec asserts a non-empty bucket filter); within the probed
    * buckets the broadcast term join keeps only exact matches. Scores
    * are identical to [[search]] by construction (same formula, same
    * DECIMAL accumulation — Bm25Spec asserts parity). */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = spark.read.parquet(s"$path/stats")
    val nBuckets = stats.select("__nbuckets").head().getInt(0)
    val qterms = queries.select(col(qIdCol).as("q_id"),
      explode(array_distinct(split(col(qTextCol), " "))).as("term"))
    // literal probe set: the union of the query terms' buckets (queries
    // are small by contract — this is a driver-side constant, not a job
    // over the corpus)
    val probed = qterms.select(
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("__bucket"))
      .distinct().collect().map(_.getLong(0))
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("__bucket").isin(probed.map(java.lang.Long.valueOf): _*))
      .join(broadcast(qterms), "term")
      .select(col("q_id"), col("term").as("__term"), col("doc_id"),
        col("tf").as("__tf"), col("dl").as("__dl"))
    val df = tf.groupBy("q_id", "__term").agg(count(lit(1)).as("__df"))
    rankTopK(
      tf.join(broadcast(df), Seq("q_id", "__term"))
        .crossJoin(broadcast(stats.select("__n", "__avgdl")))
        .withColumn("__s", termScoreCol(k1, b)),
      k)
  }
}
