package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Add-one bigram LM semantics on a hand-computable corpus: smoothed
  * conditional probabilities, per-occurrence (not per-distinct-gram)
  * weighting, context counts from bigram positions only, the unscored
  * contract for <2-token docs, and cutoff bucketing.
  */
class NgramLmSpec extends SparkSuite {

  import spark.implicits._

  // corpus model: c2(a b)=3, c2(b a)=1, c2(b c)=1; contexts c1(a)=3,
  // c1(b)=2; vocab {a,b,c,z} → V=4
  private val docs = Seq(
    1L -> "a b a b",
    2L -> "a b c",
    3L -> "z").toDF("doc_id", "text")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("nll matches the hand-derived add-one bigram model") {
    val pAB = math.log((3 + 1.0) / (3 + 4)) // p(b|a)
    val pBA = math.log((1 + 1.0) / (2 + 4)) // p(a|b)
    val pBC = math.log((1 + 1.0) / (2 + 4)) // p(c|b)
    val expected = Map(
      1L -> round6(-(2 * pAB + pBA) / 3), // "a b","b a","a b"
      2L -> round6(-(pAB + pBC) / 2))
    val got = NgramLm.perplexityProfile(docs, "doc_id", "text",
        headMax = 0.75, middleMax = 0.83)
      .orderBy("doc_id").collect()
    assert(got.length === 3)
    assert(got(0).getDouble(3) === expected(1L))
    assert(got(1).getDouble(3) === expected(2L))
    assert(got(2).isNullAt(3)) // "z" has no bigrams
    assert(got.map(_.getString(4)).toSeq ===
      Seq("head", "middle", "unscored"))
    // n_tokens / n_bigrams contracts
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((4L, 3L), (3L, 2L), (1L, 0L)))
  }

  test("repeated bigrams weight by occurrence, not distinct grams") {
    // "a b a b a b": 5 bigrams, ab×3 ba×2 — if tf were dropped the nll
    // would average over 2 distinct grams instead of 5 occurrences
    val rep = Seq(10L -> "a b a b a b").toDF("doc_id", "text")
    val corpus = docs.unionByName(rep)
    val got = NgramLm.perplexityProfile(corpus, "doc_id", "text", 1.0, 2.0)
      .filter(col("doc_id") === 10L).head()
    assert(got.getLong(2) === 5L)
    // model over the 4-doc corpus: c2(ab)=6, c2(ba)=3, c1(a)=6, c1(b)=4, V=4
    val nll = -(3 * math.log(7.0 / 10) + 2 * math.log(4.0 / 8)) / 5
    assert(got.getDouble(3) === round6(nll))
  }
}
