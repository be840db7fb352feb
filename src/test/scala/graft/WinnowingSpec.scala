package graft

import org.apache.spark.sql.functions._

import graft.functions.{ColumnBridge, WinnowFingerprints}

/** Winnowing rolling-hash fingerprints: the SIGMOD'03 guarantees —
  * shared-substring detection and position independence — plus edge
  * cases.
  */
class WinnowingSpec extends SparkSuite {

  private def fps(texts: String*): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toDF("t")
      .select(ColumnBridge.col(
        WinnowFingerprints(ColumnBridge.expr(col("t")), 8, 4)).as("f"))
      .collect().toSeq.map(_.getSeq[Long](0).toSet)
  }

  test("identical text → identical fingerprints; disjoint text → disjoint") {
    val Seq(a, b, c) = fps(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "zzzzyyyyxxxxwwwwvvvvuuuuttttssssrrrrqqqq")
    assert(a.nonEmpty && a === b)
    assert((a & c).isEmpty)
  }

  test("guarantee: substring ≥ window+k-1 chars shares a fingerprint") {
    // window=4, k=8 → any common substring of ≥ 11 chars must share one
    val shared = "EXACTLY-THIS-COMMON-RUN"
    val Seq(a, b) = fps(s"prefix one $shared suffix alpha",
      s"totally different start $shared and end")
    assert((a & b).nonEmpty)
  }

  test("position independence: early insertion keeps later fingerprints") {
    val doc = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val Seq(orig, shifted) = fps(doc, "INSERTED WORDS " + doc)
    val overlap = (orig & shifted).size.toDouble / orig.size
    info(f"fingerprint overlap after prefix insertion: $overlap%.2f")
    assert(overlap >= 0.8, s"winnowing must be shift-robust, got $overlap")
  }

  test("short and empty inputs → empty array") {
    assert(fps("", "short", "1234567") === Seq(Set(), Set(), Set()))
  }
}
