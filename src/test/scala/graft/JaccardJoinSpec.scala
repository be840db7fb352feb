package graft

import org.apache.spark.sql.functions._

import graft.functions.{ColumnBridge, Hashes}
import graft.operators.{JaccardJoin, MinHashLsh}

/** Exact n-gram Jaccard threshold join: the prefix+length filters must be
  * lossless (recall 1.0), so the operator is pinned against a brute-force
  * all-pairs scan of the same corpus. */
class JaccardJoinSpec extends SparkSuite {

  private def gramHashes(text: String, k: Int) = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(ColumnBridge.col(graft.functions.SortedGramHashes(
        ColumnBridge.expr(col("text")), k)).as("g"))
      .as[Option[Seq[Long]]].head()
  }

  test("SortedGramHashes: sorted distinct parity with hash∘WordShingles") {
    import spark.implicits._
    val texts = Seq("a b c d e", "a b a b a", "a  b  c", "lone", "x y")
    for (t <- texts; k <- Seq(2, 3)) {
      val fused = gramHashes(t, k)
      val composed = Seq(Tuple1(t)).toDF("text")
        .select(sort_array(array_distinct(transform(
          MinHashLsh.shingles(col("text"), k),
          g => Hashes.xxhash64Seed0(g)))).as("g"))
        .as[Seq[Long]].head()
      if (t.split(" ", -1).length < k) {
        assert(fused.isEmpty, s"'$t' k=$k should be null")
      } else {
        assert(fused.contains(composed), s"'$t' k=$k")
        val v = fused.get
        assert(v === v.sorted && v.distinct === v)
      }
    }
  }

  test("nearDupPairs equals brute-force all-pairs on a randomized corpus") {
    import spark.implicits._
    // Small vocab forces plenty of partial bigram overlap, so the prefix
    // and length filters must prune real borderline candidates.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val random = (0 until 70).map { i =>
      val len = 2 + rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val planted = Seq(
      (100L, "a b c d e f g h"),
      (101L, "a b c d e f g h"),     // exact dup of 100: J = 1
      (102L, "b c d e f g h"),       // drop-first of 100: J = 6/7
      (103L, "a b c d"),             // prefix of 100: J = 3/7 — below t
      (104L, "solo"))                // < k words: no grams
    val docs = (random ++ planted).toDF("doc_id", "text")

    val t = 0.5
    val got = JaccardJoin.nearDupPairs(docs, "doc_id", "text", k = 2, minJaccard = t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    val a = docs.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        MinHashLsh.shingleJaccard(col("ta"), col("tb"), 2).as("j"))
      .filter(col("j") >= t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    assert(got.keySet === brute.keySet)
    for ((k, j) <- brute) assert(got(k) === j, s"pair $k")
    assert(got.contains((100L, 101L)) && got((100L, 101L)) === 1.0)
    assert(got((100L, 102L)) === 6.0 / 7.0)
    assert(!got.keySet.exists(p => p._1 == 103L || p._2 == 103L))
    assert(!got.keySet.exists(p => p._1 == 104L || p._2 == 104L))
  }

  test("mega-bucket pair expansion streams: 2k-doc bucket, 2M pairs, O(b) memory") {
    import org.apache.spark.sql.functions._
    import graft.functions.ColumnBridge
    import spark.implicits._
    // one bucket with 2000 members → 1,999,000 pairs; the lazy Generator
    // must stream them through the count without materializing an array
    val members = (0 until 2000).map(i => (i.toLong, 100L))
    val df = Seq(Tuple1(members)).toDF("__members")
      .select(transform(col("__members"),
        m => struct(m.getField("_1").as("id"), m.getField("_2").as("n"))).as("__members"))
    val pairs = ColumnBridge.col(graft.functions.LengthFilteredPairs(
      ColumnBridge.expr(col("__members")), 0.8))
    val n = df.select(pairs.as(Seq("a", "b"))).count()
    assert(n === 2000L * 1999 / 2)
    // same shape through SortedPairs (ids only)
    val ids = Seq(Tuple1((0 until 2000).map(_.toLong))).toDF("__ids")
    val sp = ColumnBridge.col(graft.functions.SortedPairs(
      ColumnBridge.expr(col("__ids"))))
    assert(ids.select(sp.as(Seq("a", "b"))).count() === 2000L * 1999 / 2)
  }

  test("results are independent of stop-table coverage (effectiveness-only dial)") {
    import spark.implicits._
    // same skewed corpus as the brute-force test; a stop table capped at
    // 4 entries (vs ~90 bigrams) must change nothing but bucket sizes
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val docs = (0 until 70).map { i =>
      val len = 2 + rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def pairs(cap: Int) = JaccardJoin
      .nearDupPairs(docs, "doc_id", "text", k = 2, minJaccard = 0.5,
        maxStopGrams = cap)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(4) === pairs(1 << 16))
    assert(pairs(0) === pairs(1 << 16)) // empty table = pure hash order
  }

  test("threshold sweep stays lossless across t") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("p", "q", "r", "s", "t", "u")
    val docs = (0 until 40).map { i =>
      val len = 3 + rnd.nextInt(9)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val a = docs.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("id_b"), col("text").as("tb"))
    for (t <- Seq(0.3, 0.6, 0.8, 1.0)) {
      val got = JaccardJoin.nearDupPairs(docs, "doc_id", "text", k = 2, minJaccard = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .filter(MinHashLsh.shingleJaccard(col("ta"), col("tb"), 2) >= t)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute, s"t=$t")
    }
  }
}
