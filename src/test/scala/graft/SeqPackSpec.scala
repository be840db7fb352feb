package graft

import org.apache.spark.sql.functions._

import graft.operators.SeqPack

/** Concat-and-chunk sequence packing: golden assignments plus the
  * stream-reconstruction invariants that make the output usable by a
  * sequence writer. */
class SeqPackSpec extends SparkSuite {

  test("golden: docs chunk across a 10-token budget") {
    import spark.implicits._
    // one group; token counts 4, 4, 12, 3 → starts 0, 4, 8, 20
    val docs = Seq(
      (1L, 4L), (2L, 4L), (3L, 12L), (4L, 3L)).toDF("doc_id", "toks")
    val got = SeqPack.pack(docs, "doc_id", col("toks"),
        lit(0L), col("doc_id"), budget = 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got === Array(
      (1L, 0L, 0L, 1L),   // tokens 0-3 in seq 0
      (2L, 0L, 4L, 1L),   // tokens 4-7 in seq 0
      (3L, 0L, 8L, 2L),   // tokens 8-19: starts in seq 0, spans into seq 1
      (4L, 2L, 0L, 1L)))  // tokens 20-22 open seq 2
  }

  test("zero-token doc occupies zero sequences and doesn't shift the stream") {
    import spark.implicits._
    // starts: 0, 4, 4, 4 — doc 2 is empty, docs 3/4 pack as if it were absent
    val docs = Seq(
      (1L, 4L), (2L, 0L), (3L, 8L), (4L, 2L)).toDF("doc_id", "toks")
    val got = SeqPack.pack(docs, "doc_id", col("toks"),
        lit(0L), col("doc_id"), budget = 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got === Array(
      (1L, 0L, 0L, 1L),
      (2L, 0L, 4L, 0L),   // n_seqs = 0, not the div identity's 1
      (3L, 0L, 4L, 2L),   // 4..11 spans seqs 0-1 — unshifted by doc 2
      (4L, 1L, 2L, 1L)))
  }

  test("duplicate order keys: the id tiebreak pins the cumsum exactly") {
    import spark.implicits._
    // every doc shares ONE order value, so ordering falls entirely to
    // the appended id tiebreak — ids deliberately arrive scrambled
    val docs = Seq((5L, 3L), (1L, 7L), (3L, 4L), (2L, 9L), (4L, 2L))
      .toDF("doc_id", "toks").repartition(3)
    val got = SeqPack.pack(docs, "doc_id", col("toks"),
        lit(0L), lit(42L), budget = 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // sequential model in ascending doc_id order: starts 0,7,16,20,22
    assert(got === Array(
      (1L, 0L, 0L, 1L),
      (2L, 0L, 7L, 2L),   // 7..15 spans seqs 0-1
      (3L, 1L, 6L, 1L),
      (4L, 2L, 0L, 1L),
      (5L, 2L, 2L, 1L)))
  }

  test("run-twice self-parity over a multi-partition input") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate order keys AND multiple partitions AND several groups:
    // the adversarial shape for any run-order dependence in the window
    val base = (0 until 2000)
      .map(i => (i.toLong, rnd.nextInt(5).toLong, 1L + rnd.nextInt(30).toLong))
    def run(parts: Int): Array[(Long, Long, Long, Long, Long, Long)] =
      SeqPack.pack(
          base.toDF("doc_id", "ord", "toks").repartition(parts),
          "doc_id", col("toks"), pmod(col("doc_id"), lit(7L)),
          col("ord"), budget = 64)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .sortBy(_._1)
    val a = run(13)
    val b = run(5)
    assert(a.length === 2000)
    assert(a === b)
    assert(a === run(13))
  }

  test("deriveNumGroups: exact integer ceil-div with a floor") {
    import spark.implicits._
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 34L)).toDF("doc_id", "toks")
    // total 64: ceil(64/10)=7 > floor → 7; ceil(64/64)=1 < floor → 8;
    // boundary ceil(64/32)=2, ceil(64/33)=2, ceil(64/63)=2
    assert(SeqPack.deriveNumGroups(docs, col("toks"), 10L, 4) === 7)
    assert(SeqPack.deriveNumGroups(docs, col("toks"), 64L, 8) === 8)
    assert(SeqPack.deriveNumGroups(docs, col("toks"), 63L, 1) === 2)
    assert(SeqPack.deriveNumGroups(docs, col("toks"), 65L, 1) === 1)
    // empty input → the floor, not a crash on a null sum
    assert(SeqPack.deriveNumGroups(
      docs.filter(col("doc_id") < 0), col("toks"), 10L, 8) === 8)
  }

  test("invariants: offsets reconstruct the concatenated group stream") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (0 until 500)
      .map(i => (i.toLong, 1L + rnd.nextInt(40).toLong))
      .toDF("doc_id", "toks")
    val budget = 64
    val out = SeqPack.pack(docs, "doc_id", col("toks"),
        pmod(col("doc_id"), lit(4L)), col("doc_id"), budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length === 500)
    for (g <- out.groupBy(_._2).values) {
      val inOrder = g.sortBy(_._1)
      var pos = 0L
      for ((id, _, toks, seq, off, nSeqs) <- inOrder) {
        assert(seq === pos / budget, s"doc $id seq")
        assert(off === pos % budget, s"doc $id offset")
        assert(nSeqs === (pos + toks - 1) / budget - pos / budget + 1, s"doc $id span")
        pos += toks
      }
    }
  }
}
