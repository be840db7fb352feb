package graft

import org.apache.spark.sql.functions._

import graft.operators.DupSpans

/** DupSpans semantics on hand-computable fixtures (L=3): cross-doc and
  * within-doc duplicate grams, overlap merging, adjacency merging, the
  * every-doc-reports contract, and the removeSpans edit.
  */
class DupSpansSpec extends SparkSuite {

  import spark.implicits._

  // A/B share "p q r s" (two overlapping 3-grams), C repeats "k l m"
  // within itself (two spans split by a gap), D is all-unique, E is
  // fully covered by two ADJACENT dup grams (merge across the seam:
  // "a b c" also in F, "d e f" also in G).
  private val docs = Seq(
    1L -> "p q r s t u v w",
    2L -> "m n p q r s o1 o2 o3",
    3L -> "k l m z k l m",
    4L -> "d1 d2 d3 d4",
    5L -> "a b c d e f",
    6L -> "a b c z1 z2 z3",
    7L -> "z4 d e f z5 z6").toDF("doc_id", "text")

  test("PositionedGramHashes: hash-for-hash parity with the " +
      "split/slice/concat_ws shape it replaced (r14), incl. " +
      "multi-space, trailing-space, exact-L and short docs") {
    import graft.functions.{ColumnBridge, Hashes, PositionedGramHashes}
    val texts = Seq(
      "p q r s t u v w", "a b", "", "one", "a  b c", // double space
      "trailing space ", " leading", "x y z", "a b c d e f g h i j")
    for (l <- Seq(1, 2, 3, 5)) {
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val w = split(col("text"), " ")
      val positions = when(size(w) >= l, sequence(lit(1), size(w) - (l - 1)))
        .otherwise(array().cast("array<int>"))
      val old = df
        .select(col("id"), w.as("__w"), explode(positions).as("pos"))
        .select(col("id"), col("pos"),
          Hashes.xxhash64Seed0(
            concat_ws(" ", slice(col("__w"), col("pos"), lit(l)))).as("g"))
        .as[(Long, Int, Long)].collect().toSet
      val neu = df
        .select(col("id"), posexplode(ColumnBridge.col(
          PositionedGramHashes(ColumnBridge.expr(col("text")), l)))
          .as(Seq("p0", "g")))
        .select(col("id"), (col("p0") + 1).cast("int").as("pos"), col("g"))
        .as[(Long, Int, Long)].collect().toSet
      assert(neu === old, s"L=$l")
    }
  }

  test("spans: overlap merge, gap split, adjacency merge") {
    val got = DupSpans.spans(docs, "doc_id", "text", L = 3)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq === Seq(
      (1L, 1, 4),  // "p q r"+"q r s" overlap-merged
      (2L, 3, 6),  // same grams at B's offsets
      (3L, 1, 3), (3L, 5, 7), // within-doc repeat, gap at 4 splits
      (5L, 1, 6),  // "a b c"(1-3) + "d e f"(4-6) adjacent-merged
      (6L, 1, 3),
      (7L, 2, 4)))
  }

  test("profile: zeros for clean docs, counts for covered ones") {
    val got = DupSpans.profile(docs, "doc_id", "text", L = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 8L, 1L, 4L, 0.5),
      (2L, 9L, 1L, 4L, round6(4.0 / 9)),
      (3L, 7L, 2L, 6L, round6(6.0 / 7)),
      (4L, 4L, 0L, 0L, 0.0),
      (5L, 6L, 1L, 6L, 1.0),
      (6L, 6L, 1L, 3L, 0.5),
      (7L, 6L, 1L, 3L, 0.5)))
  }

  test("docs shorter than L emit no grams and profile zeros") {
    val tiny = Seq(1L -> "a b", 2L -> "a b", 3L -> "a b c d").toDF("doc_id", "text")
    val prof = DupSpans.profile(tiny, "doc_id", "text", L = 3)
      .orderBy("doc_id").collect()
    // the two "a b" docs CANNOT match (no 3-gram exists in them)
    assert(prof.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("removeSpans cuts covered tokens; fully-covered docs drop out") {
    val got = DupSpans.removeSpans(docs, "doc_id", "text", L = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) === "t u v w")
    assert(got(2L) === "m n o1 o2 o3")
    assert(got(3L) === "z")
    assert(got(4L) === "d1 d2 d3 d4") // untouched
    assert(!got.contains(5L))         // span [1,6] covers everything
    assert(got(6L) === "z1 z2 z3")
    assert(got(7L) === "z4 z5 z6")
  }

  test("profile matches a brute-force model on 30 seeded random corpora") {
    val rnd = new scala.util.Random(42)
    val L = 3
    // small vocab + short docs force dense overlap/adjacency/gap cases;
    // corpora are isolated by a token prefix so one Spark job covers all
    val corpora: Seq[(Int, Seq[(Long, Vector[String])])] =
      (0 until 30).map { ci =>
        val nDocs = 3 + rnd.nextInt(4)
        ci -> (0 until nDocs).map { j =>
          val n = rnd.nextInt(13) // 0..12 tokens (0 → one empty token)
          val toks =
            if (n == 0) Vector(s"c${ci}_x")
            else Vector.fill(n)(s"c${ci}_" + ('a' + rnd.nextInt(4)).toChar)
          (ci * 100L + j, toks)
        }
      }
    val all = corpora.flatMap(_._2)
      .map { case (id, w) => (id, w.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = DupSpans.profile(all, "doc_id", "text", L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    corpora.foreach { case (_, docs) =>
      val expected = bruteForce(docs, L)
      expected.foreach { case (id, e) =>
        assert(got(id) === e, s"doc $id")
      }
    }
  }

  /** O(n²) reference: count grams by TEXT, mark ≥2-occurrence covers,
    * merge intervals by fold. */
  private def bruteForce(docs: Seq[(Long, Vector[String])], L: Int)
      : Map[Long, (Long, Long, Long, Double)] = {
    val grams = docs.flatMap { case (id, w) =>
      (0 to w.length - L).map(i => (id, i, w.slice(i, i + L).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    docs.map { case (id, w) =>
      val ivs = grams
        .filter(g => g._1 == id && counts(g._3) >= 2)
        .map(g => (g._2, g._2 + L - 1)).sortBy(_._1)
      val merged = ivs.foldLeft(List.empty[(Int, Int)]) {
        case ((ps, pe) :: t, (s, e)) if s <= pe + 1 =>
          (ps, math.max(pe, e)) :: t
        case (acc, iv) => iv :: acc
      }
      val dup = merged.map { case (s, e) => e - s + 1 }.sum.toLong
      id -> ((w.length.toLong, merged.size.toLong, dup,
        round6(dup.toDouble / w.length)))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
