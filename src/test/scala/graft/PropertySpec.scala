package graft

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GoInts, GoTimeLayouts}
import graft.sources.{GoFloat, JsonParser, JValue, Rfc4180}

/** Property-based hardening of the coercion primitives (SURVEY §5: "add
  * ScalaCheck property tests for coercion/clamping").
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampler (scalatestplus isn't in the offline cache):
    * 200 samples from a fixed seed per property. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  // ---- GoInts vs a BigInt model ----

  test("parseInt clamps like the BigInt model for any decimal token") {
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.oneOf(8, 16, 32, 64)) {
      (v: Long, bits: Int) =>
        val s = v.toString
        val max = (BigInt(1) << (bits - 1)) - 1
        val min = -(BigInt(1) << (bits - 1))
        val expected = BigInt(v).max(min).min(max).toLong
        assert(GoInts.parseInt(s, bits) === expected)
    }
  }

  test("parseInt/parseUint reject junk to 0") {
    val junk = Gen.oneOf("", "-", "+", "1.5", "0x10", " 1", "1 ", "abc", "1e3", "٣")
    forAll(junk, Gen.oneOf(8, 16, 32, 64)) { (s: String, bits: Int) =>
      assert(GoInts.parseInt(s, bits) === 0L)
      assert(GoInts.parseUint(s, bits) === 0L)
    }
  }

  // ---- Winnowing fingerprint guarantee (SIGMOD'03 correctness property) ----

  test("winnowing: any shared substring ≥ window+k-1 yields a shared fingerprint") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    def fps(s: String): Set[Long] = {
      val arr = graft.functions.WinnowFingerprints(Literal(s), 8, 4)
        .eval(null).asInstanceOf[ArrayData]
      arr.toLongArray().toSet
    }
    val alpha = Gen.alphaLowerChar
    val piece = Gen.chooseNum(0, 30).flatMap(n => Gen.stringOfN(n, alpha))
    val common = Gen.chooseNum(11, 40).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    forAll(Gen.zip(piece, piece, piece, piece, common)) {
      case (a1, a2, b1, b2, c) =>
        val da = s"$a1$c$a2"
        val db = s"$b1$c$b2"
        assert((fps(da) & fps(db)).nonEmpty,
          s"no shared fingerprint for docs sharing ${c.length}-char run")
        // output is duplicate-free and deterministic
        val again = fps(da)
        assert(again === fps(da))
    }
  }

  // ---- Fused text-signature expressions vs their compose models ----

  private val textGen: Gen[String] = {
    // stresses empty tokens (double spaces), multi-byte UTF-8, short docs
    val word = Gen.oneOf("a", "b", "ab", "xyz", "", "日本", "longerword", "q1")
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  }

  test("MinHashTextSignature equals MinHashSignature∘WordShingles on random texts") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    forAll(textGen) { t =>
      val u = UTF8String.fromString(t)
      val sh = graft.functions.WordShingles(null, 3).nullSafeEval(u)
      val composed =
        if (sh.asInstanceOf[ArrayData].numElements() == 0) null
        else graft.functions.MinHashSignature(null, 16).nullSafeEval(sh)
      val fused = graft.functions.MinHashTextSignature(null, 3, 16).nullSafeEval(u)
      if (composed == null) assert(fused === null)
      else assert(fused.asInstanceOf[ArrayData].toLongArray().toSeq ===
        composed.asInstanceOf[ArrayData].toLongArray().toSeq, s"text='$t'")
    }
  }

  test("SimHashTextSignature equals SimHash64∘WordShingles on random texts") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(textGen) { t =>
      val u = UTF8String.fromString(t)
      val sh = graft.functions.WordShingles(null, 3).nullSafeEval(u)
      val composed = graft.functions.SimHash64(null).nullSafeEval(sh)
      val fused = graft.functions.SimHashTextSignature(null, 3).nullSafeEval(u)
      assert(fused === composed, s"text='$t'")
    }
  }

  test("SortedGramHashes equals sort∘distinct∘xxh64(WordShingles) on random texts") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.zip(textGen, Gen.oneOf(1, 2, 3))) { case (t, k) =>
      val u = UTF8String.fromString(t)
      val fused = graft.functions.SortedGramHashes(null, k).nullSafeEval(u)
      val w = t.split(" ", -1)
      if (w.length < k) assert(fused === null, s"text='$t' k=$k")
      else {
        val model = w.sliding(k).map(_.mkString(" ")).toSeq.distinct
          .map { g =>
            val gu = UTF8String.fromString(g)
            org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(gu.getBaseObject, gu.getBaseOffset, gu.numBytes, 0L)
          }.distinct.sorted
        assert(fused.asInstanceOf[ArrayData].toLongArray().toSeq === model,
          s"text='$t' k=$k")
      }
    }
  }

  test("LengthFilteredPairs equals the pair model for any member multiset") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val memberDt = ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("n", LongType))))
    val member = Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(1L, 30L))
    val members = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, member))
    forAll(Gen.zip(members, Gen.oneOf(0.5, 0.8, 1.0))) { case (ms, t) =>
      val arr = new GenericArrayData(
        ms.map { case (id, n) => InternalRow(id, n): Any }.toArray)
      val gotPairs = graft.functions
        .LengthFilteredPairs(Literal(arr, memberDt), t)
        .eval(null).iterator.map(r => (r.getLong(0), r.getLong(1))).toSet
      val dedup = ms.groupBy(_._1).map { case (id, xs) => (id, xs.head._2) }.toSeq
      val model = (for {
        (a, na) <- dedup; (b, nb) <- dedup if a < b
        if math.min(na, nb).toDouble >= t * math.max(na, nb)
      } yield (a, b)).toSet
      assert(gotPairs === model, s"members=$ms t=$t")
    }
  }

  test("CosinePairs equals the brute-force cosine pair model") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val memberDt = ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(DoubleType)))))
    // small integer coords make near-threshold cosines common; include
    // zero vectors and a mixed-dim member to hit the skip paths
    val vec = Gen.chooseNum(2, 4).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-2, 2).map(_.toDouble)))
    val member = Gen.zip(Gen.chooseNum(0L, 7L), vec)
    val members = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, member))
    def cos(x: Seq[Double], y: Seq[Double]): Option[Double] = {
      if (x.length != y.length || x.isEmpty) return None
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      if (den == 0.0) None else Some(dot / den)
    }
    forAll(Gen.zip(members, Gen.oneOf(0.0, 0.5, 0.9, 0.999))) { case (ms, t) =>
      val arr = new GenericArrayData(ms.map { case (id, v) =>
        InternalRow(id, new GenericArrayData(v.toArray)): Any
      }.toArray)
      val got = graft.functions.CosinePairs(Literal(arr, memberDt), t)
        .eval(null).iterator
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val dedup = ms.groupBy(_._1).map { case (id, xs) => (id, xs.head._2) }.toSeq
      val model = (for {
        (a, va) <- dedup; (b, vb) <- dedup if a < b
        c <- cos(va, vb) if c >= t - 1e-6
      } yield (a, b, c)).toSet
      assert(got === model, s"members=$ms t=$t")
    }
  }

  test("RarestPrefix equals take-prefix of the (df, hash) sort for any stop table") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val gramsGen = Gen.chooseNum(0, 20)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-50L, 50L)))
      .map(_.distinct.sorted)
    val stopsGen = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, Gen.zip(Gen.chooseNum(-50L, 50L), Gen.chooseNum(2L, 9L))))
      .map(_.groupBy(_._1).map { case (k, xs) => (k, xs.head._2) }.toSeq.sortBy(_._1))
    forAll(Gen.zip(gramsGen, stopsGen, Gen.oneOf(0.5, 0.8, 1.0))) { case (gs, stops, t) =>
      // the algorithm entry point directly (the expression wrapper
      // only adds the broadcast plumbing, covered by the operator
      // specs): same (df, hash) order, no session needed here
      val got = graft.functions.RarestPrefix.prefixOf(
          new GenericArrayData(gs.toArray), t,
          stops.map(_._1).toArray, stops.map(_._2).toArray)
        .asInstanceOf[ArrayData].toLongArray().toSeq
      val df = stops.toMap
      val n = gs.length
      val model =
        if (n == 0) Seq.empty[Long]
        else gs.sortBy(g => (df.getOrElse(g, 0L), g))
          .take(n - math.ceil(t * n).toInt + 1)
      assert(got === model, s"grams=$gs stops=$stops t=$t")
    }
  }

  test("ShingleJaccard equals the set-model jaccard on random text pairs") {
    import org.apache.spark.unsafe.types.UTF8String
    def grams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    forAll(Gen.zip(textGen, textGen)) { case (a, b) =>
      val ga = grams(a); val gb = grams(b)
      val union = (ga ++ gb).size
      val model = if (union == 0) 0.0 else (ga & gb).size.toDouble / union
      val got = graft.functions.ShingleJaccard(null, null, 3)
        .nullSafeEval(UTF8String.fromString(a), UTF8String.fromString(b))
        .asInstanceOf[java.lang.Double]
      assert(got === model, s"a='$a' b='$b'")
    }
  }

  test("parseUint of non-negative longs is identity below the clamp") {
    forAll(Gen.chooseNum(0L, Long.MaxValue)) { v: Long =>
      assert(GoInts.parseUint(v.toString, 64) === v)
    }
  }

  // ---- GoFloat strict grammar ----

  test("GoFloat accepts exactly what Double round-trips produce") {
    forAll(Arbitrary.arbitrary[Double]) { d: Double =>
      whenever(!d.isNaN && !d.isInfinite) {
        // Java's repr uses 'E' exponents and optional '-' — all within the
        // strconv grammar
        assert(GoFloat.strict(d.toString) === Some(d))
      }
    }
  }

  test("GoFloat rejects surrounding whitespace and suffixes") {
    forAll(Gen.chooseNum(-1e6, 1e6)) { d: Double =>
      val s = d.toString
      assert(GoFloat.strict(" " + s) === None)
      assert(GoFloat.strict(s + " ") === None)
      assert(GoFloat.strict(s + "f") === None)
    }
  }

  // ---- UnixFloat clamp invariants ----

  test("unixFloat output is always within [0, 2^32 seconds) in micros") {
    forAll(Arbitrary.arbitrary[Double], Gen.oneOf(1.0, 0.001, 0.000001, 1000.0)) {
      (sec: Double, unit: Double) =>
        val us = GoTimeLayouts.unixFloat(sec, unit)
        assert(us >= 0L && us < 4294967296L * 1000000L)
    }
  }

  // ---- RFC-4180 render/split round-trip ----

  private val cell: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', ' ', '.')))
      .map(_.mkString)

  private def render(fields: Seq[String], delim: Char): String =
    fields.map { f =>
      if (f.exists(c => c == delim || c == '"')) "\"" + f.replace("\"", "\"\"") + "\""
      else f
    }.mkString(delim.toString)

  test("split inverts quoting for any field content") {
    forAll(Gen.nonEmptyListOf(cell)) { fields: List[String] =>
      // a lone unquoted field equal to "" is fine; render+split must
      // return exactly the input fields
      val line = render(fields, ',')
      assert(Rfc4180.split(line, ',').map(_.toSeq) === Some(fields))
    }
  }

  // ---- JsonParser round-trip on generated trees ----

  private val jScalar: Gen[JValue] = Gen.oneOf(
    Gen.const(JValue.JNull),
    Arbitrary.arbitrary[Boolean].map(JValue.JBool),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(l => JValue.JNum(l.toString)),
    Gen.chooseNum(-1e9, 1e9).map(d => JValue.JNum(d.toString)),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', ' ', '中')))
      .map(cs => JValue.JStr(cs.mkString)))

  private def jValue(depth: Int): Gen[JValue] =
    if (depth <= 0) jScalar
    else Gen.frequency(
      3 -> jScalar,
      1 -> Gen.listOfN(3, jValue(depth - 1)).map(l => JValue.JArr(l.toArray)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr, jValue(depth - 1)))
        .map(kvs => JValue.JObj(scala.collection.mutable.ArrayBuffer(kvs: _*))))

  test("compact render re-parses to an equivalent tree") {
    forAll(jValue(3)) { v: JValue =>
      val text = v.compact
      val reparsed = new JsonParser().parse(text)
      assert(reparsed.isDefined, text)
      assert(reparsed.get.compact === text)
    }
  }
}
