package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) threshold self-join via
  * pigeonhole segment blocking, after Li/Deng/Feng's Pass-Join
  * (PVLDB 5(3), 2011 — public literature; the reference engine has no
  * similarity joins at all, see SURVEY.md §2.6 note on near-dup ops).
  *
  * Pigeonhole lemma: split string `a` into `d+1` contiguous segments.
  * Any `b` with `ed(a, b) <= d` can touch at most `d` of them, so at
  * least one segment of `a` survives UNEDITED in `b` — i.e. appears in
  * `b` as an exact substring, and (because the shift of any unedited
  * character is bounded by the net insertions/deletions before it,
  * itself <= d) it appears within `±d` of its position in `a`. Blocking
  * on (segment, ±d position window, ±d length window) is therefore
  * COMPLETE: recall 1.0 up to 64-bit segment-hash collisions, which can
  * only ADD candidates (the exact verify rejects them), never drop a
  * true pair.
  *
  * Shape — two linear explodes, one hash-join on 8-byte keys, verify
  * on candidates only:
  *
  *  1. Segment side: each string emits its `d+1` segments as
  *     `(xxhash64(seg), id, len, expected_start)` — O(d·N) rows of
  *     ~28 bytes, never the strings.
  *  2. Window side: each string emits every substring whose length any
  *     in-band partner's segments could take (`floor((L-d)/(d+1)) ..
  *     floor((L+d)/(d+1)) + 1` — two or three lengths), at every start
  *     position, again as 8-byte hashes — O(L·N) rows. This side is
  *     bigger but map-generated and projection-narrow; it exists so the
  *     JOIN KEY is an exact segment, not a cruder length bucket.
  *  3. Join on the hash with the length-band and position-window
  *     predicates inline, `id_a < id_b` (the lemma holds with either
  *     pair member as the segment side, so one direction suffices),
  *     then `distinct` candidate pairs — all BEFORE any string moves.
  *  4. Verify: candidates re-join the (id, string) base — two id-keyed
  *     hash joins, candidate-proportional — and run Spark's native
  *     banded `levenshtein(a, b, threshold)` (O(d·L) per pair, -1 past
  *     the band).
  *
  * Skew note for 100 TB: a segment shared by k strings expands to
  * O(k·d) candidate rows in step 3. Natural-language segment frequency
  * is Zipfian but the position window already cuts each bucket by
  * ~(2d+1)/L; for adversarial corpora (all-identical strings) the
  * output itself is Θ(k²) and no blocking can beat its own result size.
  *
  * Strings with `length <= maxDist` are dropped (their `d+1`-way split
  * has empty segments, which match everywhere): at that length the
  * predicate `ed <= d` is near-vacuous — callers pre-slice to a fixed
  * head (as q75 does) or pool tiny strings separately.
  */
object EditDistanceJoin {

  /** All pairs `(id_a < id_b, dist)` with
    * `levenshtein(str_a, str_b) <= maxDist`. */
  def selfJoin(
      df: DataFrame, idCol: String, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val d = maxDist
    val parts = d + 1

    val base = df
      .select(col(idCol).cast("long").as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull && length(col("__s")) > d)
      .withColumn("__len", length(col("__s")))

    // Segment i of a length-L string under the balanced split:
    // k = L div parts, r = L % parts; segments 0..r-1 have length k+1,
    // the rest k; 1-based start = i*k + min(i, r) + 1. (floor() because
    // Spark's `/` on integers is DOUBLE division.)
    val k = floor(col("__len") / parts).cast("int")
    val r = (col("__len") % parts).cast("int")
    val segs = base.select(
      col("__id"), col("__len"),
      explode(transform(sequence(lit(0), lit(d)), i => {
        val start = (i * k + least(i, r) + lit(1)).cast("int")
        val slen = (k + when(i < r, 1).otherwise(0)).cast("int")
        struct(start.as("p"), xxhash64(col("__s").substr(start, slen)).as("h"))
      })).as("e"))
      .select(col("__id").as("id_a"), col("__len").as("len_a"),
        col("e.p").as("p_a"), col("e.h").as("h"))

    // Window side: substrings at every start, for every segment length
    // an in-band partner could produce. The length set is the contiguous
    // integer range [floor((L-d)/parts), floor((L+d)/parts) + 1] ∩ [1, L].
    val loLen = greatest(floor((col("__len") - d) / parts).cast("int"), lit(1))
    val hiLen = least(floor((col("__len") + d) / parts).cast("int") + 1,
      col("__len"))
    val wins = base.select(
      col("__id"), col("__len"),
      explode(flatten(transform(sequence(loLen, hiLen), l =>
        transform(sequence(lit(1), col("__len") - l + 1), p =>
          struct(p.cast("int").as("p"),
            xxhash64(col("__s").substr(p, l)).as("h")))))).as("e"))
      .select(col("__id").as("id_b"), col("__len").as("len_b"),
        col("e.p").as("p_b"), col("e.h").as("h"))

    val candidates = segs.join(wins, "h")
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= d &&
        abs(col("p_a") - col("p_b")) <= d)
      .select("id_a", "id_b").distinct()

    candidates
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb"), d).as("__lev"))
      .filter(col("__lev") >= 0)
      .select(col("id_a"), col("id_b"), col("__lev").cast("long").as("dist"))
  }
}
