package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Exact duplicate-SPAN detection (the "exact substring" deduplication of
  * Lee et al., *Deduplicating Training Data Makes Language Models Better*,
  * re-expressed for a shuffle engine): a token L-gram that occurs more
  * than once in the corpus marks every token it covers as duplicated;
  * overlapping / adjacent marks merge into maximal duplicated spans per
  * document. Unlike document-level dedup (q08/q18/q24), this finds the
  * boilerplate *inside* otherwise-unique documents — license headers,
  * navigation chrome, quoted replies — which document-level verdicts
  * can't see. No reference analog; LLM-pipeline extension surface.
  *
  * The paper's single-node suffix array doesn't distribute; the
  * shuffle-native equivalent is gram fingerprinting: one pass emits
  * (8-byte gram hash) per token position, a map-combined count finds
  * grams with ≥2 occurrences (within- or cross-doc — the paper's "appears
  * more than once in the corpus" semantics), and a second pass joins the
  * position stream against the duplicated-gram set on the 8-byte key.
  * Gram TEXT never leaves its scan stage — the wire carries (hash) then
  * (doc_id, pos) ints, so the two shuffles are O(total tokens) at
  * fingerprint width, the honest distributed cost of exact-substring
  * dedup. The corpus is tokenized twice (count pass + cover pass) rather
  * than checkpointing a token-sized intermediate — the same
  * scan-twice-beats-materialize call as [[Bm25.search]]. Span merging is
  * a per-document gaps-and-islands window: input rows are only the
  * *duplicated* gram positions of each doc (≤ doc length, bounded by the
  * corpus max-doc-length contract), partition-pruned by doc id.
  *
  * 64-bit hashing means two distinct grams can collide and falsely mark
  * a span, and unlike the gram-join family there is NO downstream
  * string-exact verify here — a collision IS answer-affecting. Honest
  * math (r17, the corrected-birthday-bound discipline of
  * [[graft.functions.Hashes.fingerprint128]]): expected colliding gram
  * PAIRS ≈ C(G,2)/2⁶⁴ — negligible at millions of distinct grams
  * (~3e-8 at 10⁶), ~3×10⁴ pairs at the 100 TB point (G ≈ 10¹²). Each
  * collision only promotes its two grams' own occurrence positions
  * (typically O(1) of ~10¹³ corpus positions) to falsely-duplicated,
  * so the perturbed-span fraction stays ~1e-9 — accepted and
  * documented, deliberately NOT widened: the gram stream is the
  * corpus-dominant shuffle and a 16-byte key doubles its width for a
  * 1e-9 artifact rate (the opposite trade from the exact-dedup family,
  * where one collision deletes a whole document). Swap in
  * `fingerprint128` (or the gram text) as the key if a zero-FP
  * guarantee is ever worth the width.
  */
object DupSpans {

  /** (doc_id, pos, g): one row per token L-gram occurrence, `pos`
    * 1-based, `g` the xxhash64 fingerprint. Docs shorter than `L`
    * tokens emit nothing. r14: ONE fused pass
    * ([[graft.functions.PositionedGramHashes]] — hashes each window's
    * original byte span in place) replaces the split/slice/concat_ws
    * chain that built O(tokens·L) fresh strings per doc per
    * evaluation; DupSpansSpec pins hash-for-hash parity with the old
    * shape. */
  private def gramStream(
      docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    import graft.functions.ColumnBridge
    val grams = ColumnBridge.col(graft.functions.PositionedGramHashes(
      ColumnBridge.expr(col(textCol)), L))
    docs
      .select(col(idCol), posexplode(grams).as(Seq("__p0", "__g")))
      .select(col(idCol), (col("__p0") + 1).cast("int").as("pos"),
        col("__g"))
  }

  /** Maximal merged duplicated spans: (doc_id, span_start, span_end),
    * token-indexed inclusive, adjacent coverage merged (a span ending at
    * token t merges with one starting at t+1 — contiguous duplicated
    * text is one region regardless of which grams witnessed it). */
  def spans(
      docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    val grams = gramStream(docs, idCol, textCol, L)
    val dup = grams.groupBy("__g").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select("__g")
    val covered = grams.join(dup, "__g")
      .select(col(idCol), col("pos"), (col("pos") + (L - 1)).as("__end"))
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevMax = max(col("__end"))
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    covered
      .withColumn("__new",
        when(prevMax.isNull || col("pos") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"), max(col("__end")).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Per-document duplication profile: (id, n_tokens, n_dup_spans,
    * dup_tokens, dup_ratio). Every input doc appears exactly once —
    * span-less docs report zeros, the same left-join contract as
    * [[Contamination.ngramOverlap]]. */
  def profile(
      docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    val perDoc = spans(docs, idCol, textCol, L)
      .groupBy(idCol)
      .agg(count(lit(1)).as("__n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("__dup_toks"))
    docs
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__n_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("__dup_toks"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ratio",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** Documents with their duplicated spans cut out: (id, text) where
    * `text` keeps only tokens outside every merged span — the actual
    * "remove the duplicated substring" edit of the paper, not just a
    * per-doc score. A FULLY-covered doc (every token duplicated
    * elsewhere) emits NO row — it is a whole-document duplicate and
    * drops out of the corpus rather than surviving as an empty string;
    * DupSpansSpec pins this contract, and callers that need one row per
    * input join back against the input ids. Span rows explode to
    * covered token indices (merged spans are few per doc by
    * construction, so the expansion is the duplicated-token count, not
    * n_spans × doc length) and the kept tokens reassemble
    * position-ordered. */
  def removeSpans(
      docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    val coveredPos = spans(docs, idCol, textCol, L)
      .select(col(idCol),
        explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("__tok"))
      .join(coveredPos, Seq(idCol, "pos"), "left_anti")
      .groupBy(idCol)
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("__tok")))),
          s => s.getField("__tok"))).as("text"))
  }
}
