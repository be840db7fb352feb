package graft

import org.apache.spark.sql.functions._

import graft.operators.{MinHashLsh, SimHash}

/** MinHash-LSH and SimHash operator semantics on a controlled corpus. */
class NearDupSpec extends SparkSuite {

  private def docsDF = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "b c d e f g h i j"), // doc 1 minus first word: J = 7/8
      (3L, "z y x w v u t s r q"), // unrelated
      (4L, "a b c d e f g h i j"), // exact duplicate of 1: J = 1
      (5L, "short one"), // < 3 words → no shingles
      (6L, "p q r s t u v w x")).toDF("doc_id", "text")
  }

  test("shingles: distinct k-word windows") {
    import spark.implicits._
    val sh = Seq((1L, "a b a b a")).toDF("id", "text")
      .select(MinHashLsh.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh === Seq("a b a", "b a b")) // 3 windows, 1 dup removed
    val none = Seq((1L, "a b")).toDF("id", "text")
      .select(MinHashLsh.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(none === Seq.empty)
  }

  test("nearDupPairs finds the planted pairs and nothing else") {
    val pairs = MinHashLsh.nearDupPairs(docsDF, "doc_id", "text",
        shingleK = 3, numHashes = 64, bands = 32, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val j14 = pairs.find(p => p._1 == 1L && p._2 == 4L).get._3
    assert(j14 === 1.0)
    val j12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(j12 === 7.0 / 8.0)
  }

  test("ShingleJaccard: fused pass equals compose-then-divide on every case") {
    import spark.implicits._
    val cases = Seq(
      ("a b c d e f g h i j", "b c d e f g h i j"),  // J = 7/8
      ("a b c d e f g h i j", "a b c d e f g h i j"), // J = 1
      ("a b c d e f g h i j", "z y x w v u t s r q"), // J = 0
      ("a b a b a", "b a b a b"),                     // repeated grams dedup
      ("a  b  c d", "a  b  c d"),                     // empty tokens kept
      ("a b", "c d"),                                 // both < k words
      ("", ""),                                       // empty strings
      ("a b c d", "x y"))                             // one side < k words
    val df = cases.toDF("ta", "tb")
    val fused = df.select(
      MinHashLsh.shingleJaccard(col("ta"), col("tb"), 3).as("j"))
      .as[Double].collect().toSeq
    val composed = df.select(
      try_divide(
        size(array_intersect(MinHashLsh.shingles(col("ta"), 3),
          MinHashLsh.shingles(col("tb"), 3))).cast("double"),
        size(array_union(MinHashLsh.shingles(col("ta"), 3),
          MinHashLsh.shingles(col("tb"), 3))).cast("double")).as("j"))
      .collect().map(r => if (r.isNullAt(0)) 0.0 else r.getDouble(0)).toSeq
    assert(fused === composed) // fused's empty-union → 0.0 ≡ compose's NULL
    assert(fused.take(3) === Seq(7.0 / 8.0, 1.0, 0.0))
  }

  test("MinHashTextSignature: bit-identical to MinHashSignature∘WordShingles") {
    import spark.implicits._
    import graft.functions.{ColumnBridge => CB}
    val texts = Seq(
      "a b c d e f g h i j",
      "a b a b a",            // duplicate grams — min is idempotent
      "a  b  c d",            // empty tokens from double spaces
      "日本 語 テ ス ト",        // multi-byte UTF-8, spaces are gram cuts
      "a b",                  // < k words → null
      "")
    val df = texts.toDF("text")
    val fused = df.select(CB.col(graft.functions.MinHashTextSignature(
      CB.expr(col("text")), 3, 64)).as("s")).collect()
    val composed = df.select(CB.col(graft.functions.MinHashSignature(
      CB.expr(MinHashLsh.shingles(col("text"), 3)), 64)).as("s")).collect()
    fused.zip(composed).zip(texts).foreach { case ((f, c), t) =>
      assert(f.isNullAt(0) === c.isNullAt(0), s"null mismatch for '$t'")
      if (!f.isNullAt(0))
        assert(f.getSeq[Long](0) === c.getSeq[Long](0), s"sig mismatch for '$t'")
    }
  }

  test("SimHashTextSignature: equals SimHash64∘WordShingles incl. dedup cases") {
    import spark.implicits._
    val texts = Seq(
      "a b c d e f g h i j",
      "a b a b a b a b a",    // heavy gram duplication — dedup must match
      "a  b  c d",            // empty tokens
      "日本 語 テ ス ト",
      "a b",                  // < k words → 0L
      "")
    val df = texts.toDF("text")
    val fused = df.select(SimHash.simhashText(col("text"), 3).as("s"))
      .as[Long].collect().toSeq
    val composed = df.select(
      SimHash.simhash64(MinHashLsh.shingles(col("text"), 3)).as("s"))
      .as[Long].collect().toSeq
    assert(fused === composed)
  }

  test("simhash: identical token sets → identical signature; hamming 0") {
    import spark.implicits._
    val sigs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("id", "text")
      .select(col("id"), SimHash.simhash64(split(col("text"), " ")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    val d = Seq((sigs(1L), sigs(3L))).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b"))).head().getInt(0)
    assert(d > 0 && d <= 64)
  }

  test("HammingPairs: sorted a<b pairs within threshold, duplicate ids collapsed") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val members = new GenericArrayData(Array[Any](
      InternalRow(30L, 0L),               // out-of-order id
      InternalRow(10L, 3L),
      InternalRow(10L, 59L),              // duplicate id — first sig kept
      InternalRow(20L, 255L)))
    val dt = ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("sig", LongType))))
    // evaluate the generator directly to pin pure semantics
    val triples = graft.functions.HammingPairs(Literal(members, dt), 6)
      .eval(null).iterator.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // pairs: (10,20) xor(3,255)=252 → 6 bits ✓; (10,30) xor(3,0)=3 → 2 ✓;
    // (20,30) xor(255,0) → 8 ✗; duplicate 10 contributes once
    assert(triples === Set((10L, 20L, 6), (10L, 30L, 2)))
  }
}
