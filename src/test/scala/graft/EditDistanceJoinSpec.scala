package graft

import scala.util.Random

import graft.operators.EditDistanceJoin

/** Pass-Join pigeonhole blocking must be COMPLETE (recall 1.0), so the
  * operator is pinned against a brute-force all-pairs Levenshtein scan
  * over corpora with planted substitution/insertion/deletion edits at
  * varying string lengths, plus boundary cases (identical strings,
  * length-band edges, sub-threshold strings). */
class EditDistanceJoinSpec extends SparkSuite {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def bruteForce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.length > d && sb.length > d
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    EditDistanceJoin.selfJoin(rows.toDF("id", "s"), "id", "s", d)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("planted edits across lengths: exact parity with brute force") {
    val rnd = new Random(42)
    val vocab = "abcdefgh"
    def randStr(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 1 to edits) {
        val p = rnd.nextInt(math.max(cur.length, 1))
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.updated(p, vocab(rnd.nextInt(vocab.length)))
          case 1 => cur.take(p) + vocab(rnd.nextInt(vocab.length)) + cur.drop(p)
          case _ if cur.length > 5 => cur.take(p) + cur.drop(p + 1)
          case _ => cur
        }
      }
      cur
    }
    val originals = (0L until 30L).map(i => i -> randStr(20 + rnd.nextInt(40)))
    val mutated = originals.take(15).map { case (i, s) =>
      (i + 1000L) -> mutate(s, 1 + rnd.nextInt(4))
    }
    val rows = originals ++ mutated
    val d = 3
    val expected = bruteForce(rows, d)
    assert(expected.nonEmpty, "test corpus must contain in-threshold pairs")
    assert(run(rows, d) === expected)
  }

  test("identical strings report distance 0; disjoint strings are absent") {
    val rows = Seq(1L -> "hello world hello", 2L -> "hello world hello",
      3L -> "zzzzzzzzzzzzzzzzz")
    assert(run(rows, 2) === Set((1L, 2L, 0L)))
  }

  test("length-band edge: |len difference| = d is kept, d+1 dropped") {
    // base "aaaaaaaaaa" (10), +3 pure insertions (13) -> dist 3 kept at
    // d=3; the 14-char string is dist 4 from the base (dropped) and
    // dist 1 from the 13-char one (kept)
    val rows = Seq(1L -> "aaaaaaaaaa", 2L -> "aaaaaaaaaaaaa",
      3L -> "aaaaaaaaaaaaaa")
    assert(run(rows, 3) === Set((1L, 2L, 3L), (2L, 3L, 1L)))
  }

  test("strings of length <= maxDist are excluded by contract") {
    val rows = Seq(1L -> "ab", 2L -> "ab", 3L -> "abcdef", 4L -> "abcdef")
    assert(run(rows, 3) === Set((3L, 4L, 0L)))
  }

  test("variable-length corpus, higher threshold") {
    val rnd = new Random(7)
    def words(n: Int) = (1 to n).map(_ => Seq("key", "agg", "row", "scan",
      "slow", "fast")(rnd.nextInt(6))).mkString(" ")
    val base = (0L until 20L).map(i => i -> words(8 + rnd.nextInt(6)))
    // swap one word in half of them
    val near = base.take(10).map { case (i, s) =>
      (i + 100L) -> s.replaceFirst("key|agg|row", "xyz")
    }
    val rows = base ++ near
    val d = 6
    assert(run(rows, d) === bruteForce(rows, d))
  }

  test("strings past the packed-code bound fail loudly, not silently") {
    import spark.implicits._
    val huge = "a" * (EditDistanceJoin.MaxStrLen + 1)
    val df = Seq((1L, huge), (2L, "short string")).toDF("id", "s")
    val ex = intercept[Exception] {
      EditDistanceJoin.selfJoin(df, "id", "s", 2).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("packed window-code bound")))
  }

  test("CodepointL1: always a lower bound on 2*levenshtein (r11 filter)") {
    import graft.functions.CodepointL1
    import org.apache.spark.unsafe.types.UTF8String
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    def l1(a: String, b: String): Int =
      CodepointL1.l1(UTF8String.fromString(a), UTF8String.fromString(b))
    val rnd = new Random(11)
    val alphabets = Seq("ab", "abcdefgh", "日本語テキストと latin 混在")
    for (_ <- 1 to 300; alpha <- alphabets) {
      def str(n: Int) =
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val a = str(rnd.nextInt(30))
      val b =
        if (rnd.nextBoolean()) str(rnd.nextInt(30))
        else { // perturbation of a: the near-pair regime the filter guards
          val sb = new StringBuilder(a)
          for (_ <- 0 until rnd.nextInt(4); if sb.nonEmpty)
            sb.setCharAt(rnd.nextInt(sb.length),
              alpha(rnd.nextInt(alpha.length)))
          sb.toString
        }
      assert(l1(a, b) <= 2 * lev(a, b), s"'$a' vs '$b'")
      assert(l1(a, b) === l1(b, a)) // symmetric
    }
    assert(l1("", "") === 0)
    assert(l1("abc", "abc") === 0)
    assert(l1("abc", "abd") === 2) // one substitution: exactly 2
  }

  test("WindowCodes: element-for-element parity with the nested SQL " +
      "lambda it replaced (r14), every (len, d) shape") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (d <- Seq(1, 2, 3, 8); len <- Seq(d + 1, d + 2, 2 * d, 40, 80, 81)) {
      val parts = d + 1
      // the r13 SQL shape, verbatim
      val lambda = array_distinct(flatten(flatten(
        transform(
          filter(sequence(col("__len") - d, col("__len") + d), la => la > d),
          la => {
            val kA = floor(la / parts).cast("int")
            val rA = (la % parts).cast("int")
            val delta = (col("__len") - la).cast("int")
            transform(sequence(lit(0), lit(d)), i => {
              val pc = (i * kA + least(i, rA) + lit(1)).cast("int")
              val l = (kA + when(i < rA, 1).otherwise(0)).cast("int")
              val ii = i.cast("int")
              val lo = greatest(
                pc + greatest(-ii, delta - (lit(d) - ii)), lit(1))
              val hi = least(
                pc + least(ii, delta + (lit(d) - ii)),
                col("__len") - l + 1)
              transform(
                filter(sequence(lo, greatest(hi, lo)), p => p <= hi),
                p => i.cast("long") * lit(1L << 48) +
                  l.cast("long") * lit(1L << 24) + p.cast("long"))
            })
          }))))
      val compiled = graft.functions.ColumnBridge.col(
        graft.functions.WindowCodes(
          graft.functions.ColumnBridge.expr(col("__len")), d))
      val row = Seq(len).toDF("__len0")
        .select(col("__len0").cast("int").as("__len"))
        .select(lambda.as("a"), compiled.as("b"))
        .collect().head
      val a = row.getSeq[Long](0).sorted
      val b = row.getSeq[Long](1)
      assert(b === b.sorted, s"d=$d len=$len: codes not sorted")
      assert(b === a, s"d=$d len=$len")
      assert(b.nonEmpty)
    }
  }

  test("WindowCodesPresent: equals full-band codes when every band " +
      "length is present, and a per-length brute force otherwise (r16 " +
      "directive #5)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // reference: the full-band generator restricted per length — the
    // distinct union of WindowCodes over singleton present-sets must
    // rebuild codesForLengths for any subset
    def ref(len: Int, d: Int, present: Seq[Int]): Seq[Long] =
      present
        .filter(la => la > d && la >= len - d && la <= len + d)
        .flatMap(la => graft.functions.WindowCodes
          .codesForLengths(len, d, Array(la)).toLongArray().toSeq)
        .distinct.sorted
    for (d <- Seq(2, 8); len <- Seq(d + 2, 40, 80)) {
      val band = ((len - d) to (len + d)).filter(_ > d)
      val full = graft.functions.WindowCodes.codes(len, d).toLongArray().toSeq
      // all present == full band
      assert(graft.functions.WindowCodes
        .codesForLengths(len, d, band.toArray).toLongArray().toSeq === full)
      // sparse subsets (incl. the q75 constant-length shape and
      // out-of-band entries, which must be ignored)
      for (present <- Seq(Seq(len), Seq(len - d, len + d), Seq(len + 1),
          Seq(1, len, len + 5 * d), band.filter(_ % 2 == 0))) {
        val got = graft.functions.WindowCodes
          .codesForLengths(len, d, present.distinct.sorted.toArray)
          .toLongArray().toSeq
        assert(got === ref(len, d, present), s"d=$d len=$len present=$present")
      }
    }
    // the driver expression evaluates the same function
    val bc = spark.sparkContext.broadcast(Array(80))
    val viaExpr = Seq(80).toDF("__len0")
      .select(col("__len0").cast("int").as("__len"))
      .select(graft.functions.ColumnBridge.col(
        graft.functions.WindowCodesPresent(
          graft.functions.ColumnBridge.expr(col("__len")), 8, bc)).as("c"))
      .collect().head.getSeq[Long](0)
    assert(viaExpr === ref(80, 8, Seq(80)))
    // the q75 shape: constant length cuts the window set vs full band
    assert(viaExpr.length <
      graft.functions.WindowCodes.codes(80, 8).numElements())
  }

  test("PackedHist/PackedHistL1: always a lower bound on 2*levenshtein, " +
      "incl. bucket saturation (r14 join-time content filter)") {
    import graft.functions.{PackedHist, PackedHistL1}
    import org.apache.spark.unsafe.types.UTF8String
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    def pl1(a: String, b: String): Int =
      PackedHistL1.l1(PackedHist.pack(UTF8String.fromString(a)),
        PackedHist.pack(UTF8String.fromString(b)))
    val rnd = new Random(17)
    val alphabets = Seq("ab", "abcdefgh", "日本語テキストと latin 混在")
    for (_ <- 1 to 300; alpha <- alphabets) {
      def str(n: Int) =
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val a = str(rnd.nextInt(30))
      val b =
        if (rnd.nextBoolean()) str(rnd.nextInt(30))
        else {
          val sb = new StringBuilder(a)
          for (_ <- 0 until rnd.nextInt(4); if sb.nonEmpty)
            sb.setCharAt(rnd.nextInt(sb.length),
              alpha(rnd.nextInt(alpha.length)))
          sb.toString
        }
      assert(pl1(a, b) <= 2 * lev(a, b), s"'$a' vs '$b'")
      assert(pl1(a, b) === pl1(b, a)) // symmetric
      // never tighter than the 256-bucket filter it thins for
      assert(pl1(a, b) <= graft.functions.CodepointL1.l1(
        UTF8String.fromString(a), UTF8String.fromString(b)))
    }
    // saturation: 300 'a's overflow the 255 cap — the bound must hold
    // (saturation shrinks per-bucket differences, never grows them)
    val many = "a" * 300
    assert(pl1(many, "") <= 2 * lev(many, "")) // 255 <= 600
    assert(pl1(many, "a" * 260) === 0) // both lanes saturate
    assert(pl1(many, many) === 0)
    assert(pl1("abc", "abd") <= 2)
  }

  test("content filter prunes without changing the exact pair set") {
    // a corpus where most blocked candidates are false (shared segments
    // at matching positions but large true distance): parity must hold
    // with the L1 prefilter in place
    import spark.implicits._
    val rnd = new Random(13)
    val common = "the quick brown fox jumps over the lazy dog padding"
    val rows = (0L until 30L).map { i =>
      // same prefix (shared segments), divergent suffixes
      i -> (common + (1 to 20).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString)
    } ++ Seq(100L -> (common + "abcdefghijklmnopqrst"),
      101L -> (common + "abcdefghijklmnopqrsu")) // true pair at ed 1
    val d = 3
    assert(run(rows, d) === bruteForce(rows, d))
    assert(run(rows, d).contains((100L, 101L, 1L)))
  }
}
