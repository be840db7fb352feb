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
      .withColumn("__s",
        (log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0) *
          (col("__tf") * (k1 + 1)) /
          (col("__tf") + (col("__dl") / col("__avgdl") * b + (1 - b)) * k1))
          .cast("decimal(28,12)"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    termScore
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("__s")).cast("double"), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "doc_id", "score")
  }
}
