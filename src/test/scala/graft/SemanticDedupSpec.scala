package graft

import org.apache.spark.sql.functions._

import graft.operators.SemanticDedup

/** SemDeDup verdicts: planted duplicate groups collapse to their min-id
  * representative, near-orthogonal vectors survive, and degenerate
  * inputs (empty vectors, duplicate ids) don't drop rows. */
class SemanticDedupSpec extends SparkSuite {

  private def v(xs: Double*): Seq[Double] = xs

  test("scaled and jittered copies drop; distinct directions survive") {
    import spark.implicits._
    // three direction groups, each with planted parallel copies
    val rows = Seq(
      (1L, v(1, 0, 0, 0)), (2L, v(2, 0, 0, 0)),          // group A: 2 ~ 1
      (10L, v(0, 1, 0, 0)), (11L, v(0, 3, 0, 0)),        // group B: 11 ~ 10
      (20L, v(0, 0, 1, 1)), (21L, v(0, 0, 2, 2)),        // group C: 21 ~ 20
      (30L, v(1, 1, 1, 1)))                              // singleton
    val out = SemanticDedup.verdicts(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        minCos = 0.999, nCells = 2, sampleN = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size === 7)
    assert(out(2L) === (1L, false))
    assert(out(11L) === (10L, false))
    assert(out(21L) === (20L, false))
    assert(out(1L)._2 && out(10L)._2 && out(20L)._2 && out(30L)._2)
  }

  test("transitive in-cell chain collapses to one representative") {
    import spark.implicits._
    // only ADJACENT links qualify: cos(a,b) ≈ cos(b,c) ≈ 0.99939 ≥ 0.999
    // but cos(a,c) = 1/sqrt(1.0049) ≈ 0.99756 < 0.999 — the rep must
    // still propagate across the chain via the closure, not direct pairs
    val a = v(1, 0.000, 0, 0)
    val b = v(1, 0.035, 0, 0)
    val c = v(1, 0.070, 0, 0)
    val far = v(0, 0, 1, 0)
    val rows = Seq((5L, a), (6L, b), (7L, c), (8L, far))
    val out = SemanticDedup.verdicts(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        minCos = 0.999, nCells = 1, sampleN = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(5L) === 5L && out(6L) === 5L && out(7L) === 5L)
    assert(out(8L) === 8L)
  }

  test("empty, zero-norm, and null vectors land in cell -1 and are kept") {
    import spark.implicits._
    val rows = Seq(
      (1L, v(1, 0)), (2L, v(2, 0)),
      (3L, Seq.empty[Double]), (4L, Seq.empty[Double]),
      (5L, v(0, 0)),                         // zero norm: no defined cosine
      (6L, null.asInstanceOf[Seq[Double]]))  // null vector
    val out = SemanticDedup.verdicts(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        minCos = 0.999, nCells = 1, sampleN = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.length === 6)
    assert(out(0) === ((1L, 0, 1L, true)))
    assert(out(1)._3 === 1L && !out(1)._4)
    // every no-defined-cosine row: cell -1 (never null), kept, rep self
    for (i <- 2 until 6)
      assert(out(i) === ((out(i)._1, -1, out(i)._1, true)), s"row ${out(i)}")
  }

  test("cell blocking only LOSES duplicate pairs vs the exhaustive run") {
    import spark.implicits._
    // random directions plus planted scaled copies: nCells=1 is the
    // exhaustive all-pairs ground truth; any multi-cell run must drop a
    // SUBSET of its drops (a cross-cell split can hide a pair, but
    // blocking can never fabricate one)
    val rnd = new scala.util.Random(7)
    val base = (1L to 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian())))
    val copies = base.filter(_._1 % 3 == 0).map { case (i, v) =>
      (i + 1000L, v.map(_ * 1.5))
    }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    def dropped(nCells: Int): Set[Long] =
      SemanticDedup.verdicts(df, "vec_id", "embedding",
          minCos = 0.999, nCells = nCells, sampleN = 64)
        .filter(!col("kept")).collect().map(_.getLong(0)).toSet
    val exhaustive = dropped(1)
    val blocked = dropped(4)
    assert(blocked.subsetOf(exhaustive),
      s"blocked run fabricated drops: ${blocked -- exhaustive}")
    // scaled copies are guaranteed-same-cell (cosine is scale-invariant,
    // ties deterministic), so none of them may be lost either
    assert(blocked === exhaustive)
    assert(exhaustive === copies.map(_._1).toSet)
  }

  test("duplicate ids keep one verdict row per input row, first vector wins") {
    import spark.implicits._
    val rows = Seq((1L, v(1, 0)), (1L, v(1, 0)), (2L, v(3, 0)))
    val out = SemanticDedup.verdicts(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        minCos = 0.999, nCells = 1, sampleN = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.length === 3) // spine preserves input multiplicity
    assert(out.count(t => t._1 == 1L && t._2 == 1L && t._3) === 2)
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 1L, false)))
  }
}
