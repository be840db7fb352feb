package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy concat-and-chunk sequence packing — the standard way training
  * corpora are laid out into fixed-token-budget sequences (documents
  * concatenated in a deterministic order, the stream split every
  * `budget` tokens; "packing" in the Raffel et al. T5 / GPT-3 data
  * pipeline sense). No reference analog; part of the LLM-pipeline
  * extension surface.
  *
  * Scale shape: packing is inherently sequential, so the corpus is
  * first split into `numGroups` deterministic pack groups and each
  * group packs independently — ONE shuffle (the per-group window sort),
  * no global sort, and `numGroups` is the parallelism/sequence-length
  * dial (each group yields its own sequence numbering; the pair
  * (pack_group, seq_id) is the globally unique sequence key). Rows
  * carry (id, group, n_tokens) — 24 bytes; text never moves: a
  * downstream writer joins the assignment back and streams each
  * group's docs in (seq_id, tok_offset) order.
  *
  * Packing math per group, docs in ascending `orderCol` order:
  * `tok_start = cumsum(tokens) - tokens`; a doc's first token lands in
  * sequence `floor(tok_start / budget)` at offset `tok_start % budget`,
  * and the doc spans `floor((tok_start + tokens - 1) / budget) -
  * seq_id + 1` consecutive sequences (concat-and-chunk splits across
  * the boundary rather than padding). Everything is integer window
  * arithmetic — deterministic, no RNG, and SQL-expressible, so the
  * whole operator is oracle-checkable.
  */
object SeqPack {

  /** Default pack-group sizing: 32 budget-512 sequences per group. Sized
    * for the test corpora (sf0.01 stays at the 8-group floor, so gate
    * results are unchanged; sf0.1+ scales up); a production run packs
    * orders of magnitude more tokens per group (e.g. 1e9) — the point is
    * that group count is derived from data volume, never a literal. */
  val DefaultTokensPerGroup: Long = 16384L

  /** Derive the pack parallelism from input size:
    * `max(minGroups, ceil(total_tokens / targetTokensPerGroup))` in exact
    * integer arithmetic (one cheap count-shaped aggregation job; the
    * token column is typically already computed, so this scans only it).
    * Deterministic for a fixed input, so an oracle can re-derive the
    * identical count with `greatest(minGroups, (sum(toks) + T - 1) // T)`.
    * Without this a fixed group count serializes into a handful of giant
    * sequential cumsums at 100× the data — the group count IS the dial
    * that keeps per-group window sorts bounded. */
  def deriveNumGroups(
      docs: DataFrame, tokensCol: Column,
      targetTokensPerGroup: Long = DefaultTokensPerGroup,
      minGroups: Int = 8): Int = {
    require(targetTokensPerGroup >= 1 && minGroups >= 1)
    val total = docs
      .agg(coalesce(sum(tokensCol.cast("long")), lit(0L)))
      .head.getLong(0)
    val derived = (total + targetTokensPerGroup - 1) / targetTokensPerGroup
    math.min(math.max(minGroups.toLong, derived), Int.MaxValue.toLong).toInt
  }

  /** docs → (id, pack_group, n_tokens, seq_id, tok_offset, n_seqs) with
    * one row per input doc. `groupCol` must be a deterministic
    * expression over the row (e.g. `pmod(col("doc_id"), 32)`). The id
    * column is appended to the window order as a tiebreak so duplicate
    * `orderCol` values can't make the cumsum run-order-dependent. */
  def pack(
      docs: DataFrame, idCol: String, tokensCol: Column,
      groupCol: Column, orderCol: Column, budget: Int): DataFrame = {
    require(budget >= 1)
    // the order expression is aliased before the window so arbitrary
    // expressions (not just bare columns) survive the projection
    val w = Window.partitionBy(col("pack_group")).orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer `div`, not double /: exact beyond 2^53 cumulative tokens,
    // and all operands are non-negative so div == floor; a zero-token
    // doc occupies zero sequences (the div identity would say 1)
    docs
      .select(col(idCol), groupCol.cast("long").as("pack_group"),
        tokensCol.cast("long").as("n_tokens"), orderCol.as("__ord"))
      .withColumn("__tok_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col(idCol), col("pack_group"), col("n_tokens"),
        expr(s"__tok_start div $budget").as("seq_id"),
        pmod(col("__tok_start"), lit(budget.toLong)).as("tok_offset"),
        when(col("n_tokens") === 0L, 0L)
          .otherwise(expr(s"(__tok_start + n_tokens - 1) div $budget")
            - expr(s"__tok_start div $budget") + 1).as("n_seqs"))
  }
}
