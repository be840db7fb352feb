package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the training-window prep step that
  * turns long documents into fixed-size overlapping token windows (the
  * "context window packing" precursor: chunk here, pack with
  * [[SeqPack]]).
  *
  * Design for 100 TB: the whole operator is a narrow projection — one
  * `posexplode(sequence(...))` per document, no shuffle, no state. The
  * fan-out factor is bounded by `ceil(maxDocTokens / stride)`, so output
  * size scales linearly with corpus token count regardless of document
  * length skew: a 1 M-token outlier document becomes ~25 K rows at the
  * default stride instead of one executor-killing row. Everything stays
  * inside whole-stage codegen (built-in `sequence`/`slice`/`concat_ws`
  * only), and the chunk text is assembled from the SAME token array the
  * starts were derived from, so chunk boundaries can never drift from
  * the token segmentation.
  *
  * Window geometry (all 1-based, mirroring the SQL oracle):
  * starts are `1, 1+stride, 1+2·stride, …` while `start ≤ n_tokens`;
  * each chunk is `tokens[start, start+window-1]` clamped at the document
  * end. The trailing fragment — with `minTail ≤ stride + 1` only the
  * LAST chunk can ever be shorter than `minTail` (remaining length drops
  * by `stride` per step, so the second-to-last chunk always has
  * ≥ stride + 1 tokens) — is dropped when shorter than `minTail`, UNLESS
  * it is the document's only chunk (`start == 1`), so no non-empty
  * document vanishes from the output. `minTail` beyond that bound is
  * rejected: it would silently drop a RUN of short clamped chunks, not
  * the single tail fragment this contract names.
  */
object Chunker {

  /** Explode `textCol` (whitespace tokens) into overlapping chunks.
    * Output: idCol, chunk_id (0-based), chunk (string), n_tokens.
    * `stride < window` ⇒ consecutive chunks overlap by `window - stride`
    * tokens (the usual "repeat a little context" training shape). */
  def slidingChunks(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 50, stride: Int = 40, minTail: Int = 10): DataFrame = {
    require(window > 0 && stride > 0 && minTail >= 0,
      s"window/stride must be positive, got window=$window stride=$stride minTail=$minTail")
    // beyond stride+1 the filter stops meaning "drop the short tail":
    // with stride < window, any minTail in (stride+1, window] drops a
    // suffix RUN of short clamped chunks (and past window, full interior
    // windows) — reject rather than silently widen the contract
    require(minTail <= stride + 1,
      s"minTail=$minTail > stride+1=${stride + 1} would drop interior " +
        "chunks, not just the single trailing fragment")
    val toks: Column = split(col(textCol), " ")
    docs
      // null text: split→null, size→-1, and sequence(1,-1) THROWS; the
      // oracle's range(1, NULL+1) emits no rows — drop, don't crash
      .filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__w"), size(toks).as("__n"))
      .select(col(idCol), col("__w"), col("__n"),
        posexplode(sequence(lit(1), col("__n"), lit(stride)))
          .as(Seq("chunk_id", "__start")))
      // keep: full windows, tails of >= minTail tokens, or the only chunk
      .filter(col("__start") === 1 ||
        col("__n") - col("__start") + 1 >= minTail)
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__w"), col("__start"), lit(window)))
          .as("chunk"),
        least(col("__n") - col("__start") + 1, lit(window))
          .cast("int").as("n_tokens"))
  }
}
