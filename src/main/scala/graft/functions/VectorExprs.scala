package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass expressions for the hot loops of the LLM-pipeline
  * operators. The Column-API (`aggregate`/`zip_with`) formulations of
  * these allocate an array per row per step in interpreted lambda
  * evaluation; these evaluate in one tight Scala loop over ArrayData —
  * 10-100× per-row — while staying ordinary Catalyst expressions in the
  * plan (prunable, null-aware).
  */

/** Distinct k-word shingles of a single-space-separated text column, as
  * one native pass (split semantics mirror Spark's `split(text, " ")`
  * with unlimited limit — empty tokens are kept — and first-occurrence
  * distinct order like `array_distinct`). */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val words = text.split(" ", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - k) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a string-array column: `numHashes` values, each
  * the minimum over elements of `h1(e) + i * h2(e)` (the standard
  * two-hash construction — Broder; internal seeds need no cross-system
  * parity, only determinism). Empty/missing arrays → null. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
      val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1L)
      var k = 0
      while (k < numHashes) {
        val h = h1 + k * h2
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered pairs (a, b) with a < b from a long-array column — the
  * single-pass form of an LSH bucket's candidate expansion (replaces a
  * bucket self-join, which would execute the whole signature pipeline
  * twice). Duplicate ids contribute one pair.
  *
  * A lazy [[Generator]] (use directly in a select, no explode): a
  * bucket's O(b²) pair set is streamed into the downstream consumer one
  * row at a time instead of materialized as an in-memory array, so a
  * pathological mega-bucket degrades to CPU time rather than executor
  * OOM. Memory stays O(b) (the sorted id array). */
case class SortedPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(ids)
    // drop duplicates in place (sorted)
    var m = 0
    i = 0
    while (i < n) {
      if (m == 0 || ids(m - 1) != ids(i)) { ids(m) = ids(i); m += 1 }
      i += 1
    }
    PairStream.pairs(m, (i, j) => InternalRow(ids(i), ids(j)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Lazy i<j pair iterator shared by the bucket-expansion generators;
  * `emit` may return null to filter a pair out. */
private[functions] object PairStream {
  /** Index permutation sorting by `ids` — O(n log n) (insertion into
    * parallel arrays would be O(n²) exactly on the mega-bucket inputs
    * the generators are documented to stream through). */
  def sortPermutation(ids: Array[Long], n: Int): Array[Int] = {
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Long.compare(ids(a), ids(b)))
    idx.map(_.intValue())
  }

  def pairs(m: Int, emit: (Int, Int) => InternalRow): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var ready: InternalRow = _
      private def advance(): Unit = {
        while (ready == null && i < m - 1) {
          if (j >= m) { i += 1; j = i + 1 }
          else { ready = emit(i, j); j += 1 }
        }
      }
      override def hasNext: Boolean = { advance(); ready != null }
      override def next(): InternalRow = {
        advance()
        if (ready == null) throw new NoSuchElementException("next on empty pair stream")
        val r = ready; ready = null; r
      }
    }
}

/** In-bucket SimHash candidate expansion: input array<struct<id,sig>>,
  * output all pairs (id_a < id_b) whose 64-bit signatures are within
  * `maxHamming` — candidate generation and Hamming verification fused in
  * one pass, so the quadratic in-bucket scan emits only verified pairs
  * (replaces a bucket self-join, which would execute the simhash pipeline
  * twice and shuffle it twice). Duplicate ids keep their first signature.
  * A lazy [[Generator]] like [[SortedPairs]]: O(b) memory, pairs
  * streamed, rejected pairs never allocated. */
case class HammingPairs(child: Expression, maxHamming: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val rawIds = new Array[Long](n)
    val rawSigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      rawIds(i) = row.getLong(0)
      rawSigs(i) = row.getLong(1)
      i += 1
    }
    // O(n log n) id sort (stable) + duplicate compaction keeping the
    // first signature — a mega-bucket must not hit an O(n²) sort before
    // its lazy pair stream even starts
    val perm = PairStream.sortPermutation(rawIds, n)
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var m = 0
    i = 0
    while (i < n) {
      val p = perm(i)
      if (m == 0 || ids(m - 1) != rawIds(p)) {
        ids(m) = rawIds(p); sigs(m) = rawSigs(p); m += 1
      }
      i += 1
    }
    PairStream.pairs(m, (i, j) => {
      val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
      if (h <= maxHamming) InternalRow(ids(i), ids(j), h) else null
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** In-cell cosine candidate expansion (the SemDeDup in-cluster scan):
  * input array<struct<id:long, vec:array<double>>>, output all pairs
  * (id_a < id_b) whose exact cosine reaches `minCos` minus a 1e-6
  * relaxation — one full rounding step, so every pair whose µ-ROUNDED
  * (6-digit) cosine can still reach the threshold is emitted and the
  * caller's `round(cos, 6) >= minCos` filter makes the final decision
  * (a narrower relaxation would silently drop pairs the suite's other
  * cosine operators, and the q47 oracle, accept). Pair generation and
  * cosine verification are fused in one pass (replaces a cell
  * self-join, which would shuffle vectors twice and materialize the
  * quadratic pair set); rejected pairs are never allocated, and a
  * mega-cell streams lazily like [[SortedPairs]] (the id sort is an
  * O(n log n) index permutation, not an insertion sort, for the same
  * reason). Duplicate ids keep their first vector; members with a null
  * vector, and pairs with mismatched dimensionality or a zero-norm
  * side, have no defined cosine and are skipped. */
case class CosinePairs(child: Expression, minCos: Double)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val nIn = arr.numElements()
    val rawIds = new Array[Long](nIn)
    val rawVecs = new Array[Array[Double]](nIn)
    var n = 0
    var i = 0
    while (i < nIn) {
      val row = arr.getStruct(i, 2)
      if (row != null && !row.isNullAt(1)) { // null vector: no defined cosine
        rawIds(n) = row.getLong(0)
        rawVecs(n) = row.getArray(1).toDoubleArray()
        n += 1
      }
      i += 1
    }
    val perm = PairStream.sortPermutation(rawIds, n)
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    // compact duplicate ids while applying the permutation, keeping the
    // first (lowest original index among equal ids after a stable sort)
    var m = 0
    i = 0
    while (i < n) {
      val p = perm(i)
      if (m == 0 || ids(m - 1) != rawIds(p)) {
        ids(m) = rawIds(p); vecs(m) = rawVecs(p); m += 1
      }
      i += 1
    }
    // precompute norms once per member, not once per pair
    val norms = new Array[Double](m)
    i = 0
    while (i < m) {
      val x = vecs(i)
      var s = 0.0
      var d = 0
      while (d < x.length) { s += x(d) * x(d); d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    val relaxed = minCos - 1e-6
    PairStream.pairs(m, (i, j) => {
      val x = vecs(i); val y = vecs(j)
      if (x.length != y.length || x.length == 0 ||
          norms(i) == 0.0 || norms(j) == 0.0) null
      else {
        var dot = 0.0
        var d = 0
        while (d < x.length) { dot += x(d) * y(d); d += 1 }
        val cos = dot / (norms(i) * norms(j))
        if (cos >= relaxed) InternalRow(ids(i), ids(j), cos) else null
      }
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PPJoin prefix extraction under a rare-first canonical gram order:
  * input a hash-ascending distinct gram array ([[SortedGramHashes]]),
  * output its first `n - ceil(t·n) + 1` grams under the total order
  * `(df(g), hash(g))`, where `df` is looked up in a bounded stop-gram
  * table (the corpus's top-C grams by doc frequency; absent → 0).
  *
  * The prefix-filter lemma holds under ANY globally consistent total
  * order — the df table only steers EFFECTIVENESS (common grams sort to
  * the suffix, so they stop creating quadratic index buckets), never
  * correctness: a gram missing from the table orders by hash among the
  * "rare" class on every doc identically. This is what makes the scheme
  * 100 TB-safe: the exact PPJoin frequency order needs a corpus-wide
  * (gram → df) join plus a per-doc sort — two data-proportional
  * shuffles — while the bounded table (every df≥2 gram under
  * [[graft.operators.StopGrams]]'s driver budget, ≪ corpus bytes)
  * turns the reorder into a pure map. Non-stop grams are already in
  * hash order in the input, so the reorder is one merge of the (few)
  * in-doc stop grams behind the non-stop run.
  *
  * The table travels as an explicit [[Broadcast]] (r16): embedded
  * Seqs ride `ctx.addReferenceObj`'s expression reference into EVERY
  * stage's task binary, and the gram joins reference this expression
  * from ~7 stages — at the 64 MiB budget bound that is ~half a GB of
  * redundant torrent traffic per executor plus per-stage driver
  * serialization, where the broadcast ships the two primitive arrays
  * once per executor, fetched lazily at first eval. Equality note:
  * the broadcast handle compares by reference, which is safe here —
  * each operator invocation builds exactly ONE prefix expression
  * instance and reuses it, so semanticEquals within a plan still
  * holds; no cross-plan subexpression elimination applies to a
  * per-query table. */
case class RarestPrefix(child: Expression, minJaccard: Double,
    stop: org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Long])])
    extends UnaryExpression with UnaryEvalCodegen {
  require(minJaccard > 0.0 && minJaccard <= 1.0)

  @transient private lazy val keysArr: Array[Long] = stop.value._1
  @transient private lazy val dfsArr: Array[Long] = stop.value._2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  override def nullSafeEval(input: Any): Any =
    RarestPrefix.prefixOf(
      input.asInstanceOf[ArrayData], minJaccard, keysArr, dfsArr)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RarestPrefix {
  /** The prefix algorithm itself, Spark-context-free (PropertySpec
    * pins it against the sort-take model without a session): input a
    * hash-ascending distinct gram array, output its first
    * `n − ceil(t·n) + 1` grams under the (df, hash) total order. */
  def prefixOf(arr: ArrayData, minJaccard: Double,
      keysArr: Array[Long], dfsArr: Array[Long]): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val p = n - math.ceil(minJaccard * n).toInt + 1
    val rare = new Array[Long](n)
    var nRare = 0
    // (df, hash) pairs for in-doc stop grams; few per doc, so boxed
    // sorting is fine
    var stops: java.util.ArrayList[Array[Long]] = null
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val idx = java.util.Arrays.binarySearch(keysArr, h)
      if (idx >= 0) {
        if (stops == null) stops = new java.util.ArrayList[Array[Long]]()
        stops.add(Array(dfsArr(idx), h))
      } else {
        rare(nRare) = h
        nRare += 1
      }
      i += 1
    }
    val out = new Array[Long](math.min(p, n))
    val take = out.length
    var o = 0
    while (o < take && o < nRare) { out(o) = rare(o); o += 1 }
    if (o < take) {
      stops.sort((a: Array[Long], b: Array[Long]) => {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(a(1), b(1))
      })
      var s = 0
      while (o < take) { out(o) = stops.get(s)(1); s += 1; o += 1 }
    }
    new GenericArrayData(out)
  }

  /** Broadcast a collected (gram, df) stop table, hash-sorted so the
    * expression can binary-search it. One broadcast per operator
    * invocation; the two primitive arrays ship once per executor. */
  def broadcastTable(
      spark: org.apache.spark.sql.SparkSession,
      byKeyAsc: Array[(Long, Long)])
      : org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Long])] = {
    require(byKeyAsc.isEmpty ||
      byKeyAsc.iterator.map(_._1).sliding(2).forall(
        w => w.length < 2 || w(0) < w(1)),
      "stop table must be strictly key-ascending")
    spark.sparkContext.broadcast(
      (byKeyAsc.map(_._1), byKeyAsc.map(_._2)))
  }
}

/** In-bucket candidate expansion with PPJoin's length filter fused in:
  * input array<struct<id:long, n:long>> (n = the doc's distinct-gram
  * count), output pairs (id_a < id_b) with `min(n_a,n_b) >= t·max(n_a,
  * n_b)` — a pair below that bound cannot reach Jaccard t, so it is
  * pruned inside the quadratic bucket scan instead of surviving to the
  * distinct + verify joins. Replaces carrying sizes via two joins, which
  * would re-run the gram pass over the whole corpus twice more.
  * Duplicate ids keep their first n (ids are unique per bucket by
  * construction — grams are distinct per doc). A lazy [[Generator]]
  * like [[SortedPairs]]: O(b) memory even when a frequent gram escapes
  * the bounded stop table and forms a mega-bucket. */
case class LengthFilteredPairs(child: Expression, minJaccard: Double)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val ns = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      ns(i) = row.getLong(1)
      i += 1
    }
    // O(n log n) permutation sort, NOT insertion sort: this generator's
    // whole reason to stream lazily is the mega-bucket a frequent gram
    // forms when it escapes the bounded stop table, and an O(n²) shuffle
    // of 100k members would pin the task before the first pair emits
    // (same rationale as HammingPairs/CosinePairs).
    val perm = PairStream.sortPermutation(ids, n)
    val sIds = new Array[Long](n)
    val sNs = new Array[Long](n)
    var m = 0
    i = 0
    while (i < n) {
      val p = perm(i)
      if (m == 0 || sIds(m - 1) != ids(p)) {
        sIds(m) = ids(p); sNs(m) = ns(p); m += 1
      }
      i += 1
    }
    System.arraycopy(sIds, 0, ids, 0, m)
    System.arraycopy(sNs, 0, ns, 0, m)
    PairStream.pairs(m, (i, j) => {
      val lo = math.min(ns(i), ns(j)).toDouble
      val hi = math.max(ns(i), ns(j)).toDouble
      if (lo >= minJaccard * hi) InternalRow(ids(i), ids(j)) else null
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit sign-vote SimHash of a string-array column (xxhash64-seed0 per
  * token, ±1 vote per bit, sign → bit). Empty arrays hash to 0 with every
  * vote negative — deterministic. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two double-array columns in one fused loop
  * (dot, |a|, |b| accumulated together — deterministic sequential order,
  * zero allocation). Mismatched/empty lengths → null. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with BinaryEvalCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"((java.lang.Double) $x).doubleValue()"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || y.numElements() != n) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Indices of the `nProbe` nearest centroids (cosine, ties → lower
  * index) for a double-array vector — the IVF coarse quantizer. The
  * centroid table is a plan-time constant carried in the expression
  * (small by construction: nCells × dim), so assignment is a pure map
  * over the corpus with no join or shuffle. Centroid norms are
  * precomputed once per executor. A centroid whose dimensionality
  * doesn't match the row's vector scores -∞ (never probed). */
case class NearestCells(
    child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return null
    var vn = 0.0
    var i = 0
    while (i < n) { val xi = x.getDouble(i); vn += xi * xi; i += 1 }
    val vNorm = math.sqrt(vn)
    if (vNorm == 0.0) return null
    val k = cents.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      scores(c) =
        if (cent.length != n || norms(c) == 0.0) Double.NegativeInfinity
        else {
          var dot = 0.0; var j = 0
          while (j < n) { dot += x.getDouble(j) * cent(j); j += 1 }
          dot / (vNorm * norms(c))
        }
      c += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var r = 0
    var done = false
    while (r < m && !done) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!taken(j) && scores(j) > bestScore) { best = j; bestScore = scores(j) }
        j += 1
      }
      // best stays -1 when every remaining centroid scored -∞ (e.g. all
      // centroids mismatch this vector's dimensionality) — stop probing
      if (best < 0) done = true
      else { taken(best) = true; out(r) = best; r += 1 }
    }
    if (r == 0) null else new GenericArrayData(java.util.Arrays.copyOf(out, r))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit-max hyperplane (sign-random-projection) signature of a
  * double-array vector in ONE native pass: bit `p` is set iff the dot
  * product with pseudo-random plane `p` is ≥ 0. Plane p's weight for
  * dimension d is `XXH64.hashLong(d, seed = p) / 2^63` ∈ [-1, 1) —
  * bit-for-bit the weights (and left-to-right accumulation order) of the
  * higher-order-function formulation this replaces, which materialized
  * `nPlanes` zipped arrays per row and was 4× slower under heap
  * pressure. Zero allocation per row; null/empty vector → null.
  */
case class HyperplaneSignature(child: Expression, nPlanes: Int)
    extends UnaryExpression with CodegenFallback {
  require(nPlanes >= 1 && nPlanes <= 64)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += v.getDouble(d) *
          (XXH64.hashLong(d.toLong, p.toLong).toDouble / 9.223372036854776e18)
        d += 1
      }
      if (dot >= 0) sig |= 1L << p
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact shingle-Jaccard of two texts, fused into one pass: distinct
  * k-word-gram sets of both sides and |A∩B| / |A∪B| computed directly
  * from two hash sets — no shingle arrays materialized, no
  * `array_intersect`/`array_union` re-hashing passes. Gram semantics are
  * identical to [[WordShingles]] (split on single space, empty tokens
  * kept, distinct), so swapping this in for the compose-then-divide
  * formulation changes no output value. Empty union (both sides shorter
  * than k words) → 0.0; the candidate-verify call sites all threshold or
  * echo the value, and the compose form's NULL (0/0 division) is
  * likewise dropped by every threshold filter. */
/** The ONE definition of a string k-word-gram set — shared by the
  * string-exact verify expressions ([[ShingleJaccard]],
  * [[ShingleContainment]]) so their gram semantics can never diverge
  * from each other (or from the oracles that re-derive them). */
private[functions] object StringGrams {
  def of(text: String, k: Int): java.util.HashSet[String] = {
    val words = text.split(" ", -1)
    val set = new java.util.HashSet[String]()
    var i = 0
    val last = words.length - k
    while (i <= last) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      set.add(sb.toString)
      i += 1
    }
    set
  }
}

case class ShingleJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with BinaryEvalCodegen {
  require(k >= 1)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"((java.lang.Double) $x).doubleValue()"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val setA = StringGrams.of(a.asInstanceOf[UTF8String].toString, k)
    val setB = StringGrams.of(b.asInstanceOf[UTF8String].toString, k)
    val union = setA.size + setB.size
    if (union == 0) return java.lang.Double.valueOf(0.0)
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) inter += 1
    java.lang.Double.valueOf(inter.toDouble / (union - inter).toDouble)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact k-word-gram containment of `left` IN `right`:
  * |g(L) ∩ g(R)| / |g(L)| — the asymmetric sibling of
  * [[ShingleJaccard]] (quote/snippet detection: a short doc wholly
  * inside a long one scores ~1.0 where Jaccard stays near |L|/|R|).
  * String-gram-exact like the Jaccard verify, so the hash-based
  * candidate stages can only perturb pruning, never the reported
  * value. Left side with no grams (< k words) has no defined
  * containment → 0.0, and the candidate stages never emit such docs. */
case class ShingleContainment(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with BinaryEvalCodegen {
  require(k >= 1)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"((java.lang.Double) $x).doubleValue()"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val setA = StringGrams.of(a.asInstanceOf[UTF8String].toString, k)
    if (setA.isEmpty) return java.lang.Double.valueOf(0.0)
    val setB = StringGrams.of(b.asInstanceOf[UTF8String].toString, k)
    var inter = 0
    val it = setA.iterator()
    while (it.hasNext) if (setB.contains(it.next())) inter += 1
    java.lang.Double.valueOf(inter.toDouble / setA.size.toDouble)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature computed directly from the text bytes — the fused
  * form of `MinHashSignature(WordShingles(text, k))`. Each k-word gram
  * of a single-spaced text is a contiguous byte slice of the original
  * UTF8String (space is never a UTF-8 continuation byte), so the
  * signature hashes gram slices in place: zero gram strings, zero
  * array materialization, one int-offsets pass. Produces BIT-IDENTICAL
  * signatures to the compose form: gram bytes are the same slices
  * WordShingles would emit, and MinHash's running min is idempotent so
  * skipping WordShingles' dedup changes nothing. Fewer than k words →
  * null (same null-guard contract as the compose form). */
case class MinHashTextSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with UnaryEvalCodegen {
  require(k >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nWords = 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) nWords += 1
      i += 1
    }
    if (nWords < k) return null
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = nWords - k + 1
    var g = 0
    while (g < m) {
      val gStart = starts(g)
      // gram ends where word g+k-1 ends: one byte before the next word's
      // start, or at the end of the buffer for the final word
      val gEnd = if (g + k < nWords) starts(g + k) - 1 else len
      val nb = gEnd - gStart
      val h1 = XXH64.hashUnsafeBytes(base, off + gStart, nb, 0L)
      val h2 = XXH64.hashUnsafeBytes(base, off + gStart, nb, 1L)
      var j = 0
      while (j < numHashes) {
        val h = h1 + j * h2
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct xxhash64-seed-0 values of the k-word gram byte slices
  * of a single-spaced text — the inverted-index key set of the exact
  * Jaccard threshold join ([[graft.operators.JaccardJoin]]). Grams are
  * hashed in place like [[MinHashTextSignature]] (zero gram strings);
  * ascending hash order doubles as the canonical global gram order the
  * PPJoin prefix filter requires. Fewer than k words → null (same
  * explode null-guard contract as the signature expressions). Distinct
  * grams of one doc that collide in 64 bits dedup to one entry — the
  * same hash-set approximation documented on [[SimHashTextSignature]];
  * the operator's final verify recomputes Jaccard over exact gram
  * strings, so collisions can only perturb candidate pruning. */
/** POSITION-KEYED k-word-gram hashes: element i (0-based) is the
  * xxhash64-seed-0 of the gram starting at token i+1 — the fused form
  * of `xxhash64(concat_ws(" ", slice(split(text, " "), pos, k)))` that
  * [[graft.operators.DupSpans]] evaluated per position (r14: that
  * shape re-split and re-concatenated the text once per token window —
  * O(tokens·k) fresh strings per doc per pass, twice per query). The
  * byte-span identity [[SortedGramHashes]] already relies on makes the
  * fusion exact: joining `split(" ", -1)` tokens with " " reconstructs
  * the original byte span verbatim (empty tokens contribute nothing
  * while the joiners reproduce each original space), so each gram hash
  * reads the text bytes IN PLACE — one pass, zero gram strings.
  * Fewer than k tokens → empty array (the caller's explode emits
  * nothing, matching the sequence-guard contract); null text → null.
  * Order is positional, NOT sorted, and duplicates stay — spans need
  * every occurrence at its position. */
case class PositionedGramHashes(child: Expression, k: Int)
    extends UnaryExpression with UnaryEvalCodegen {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nWords = 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) nWords += 1
      i += 1
    }
    if (nWords < k) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val m = nWords - k + 1
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      val gStart = starts(g)
      val gEnd = if (g + k < nWords) starts(g + k) - 1 else len
      hs(g) = XXH64.hashUnsafeBytes(base, off + gStart, gEnd - gStart, 0L)
      g += 1
    }
    new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SortedGramHashes(child: Expression, k: Int)
    extends UnaryExpression with UnaryEvalCodegen {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def castResult(x: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $x"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nWords = 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) nWords += 1
      i += 1
    }
    if (nWords < k) return null
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val m = nWords - k + 1
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      val gStart = starts(g)
      val gEnd = if (g + k < nWords) starts(g + k) - 1 else len
      hs(g) = XXH64.hashUnsafeBytes(base, off + gStart, gEnd - gStart, 0L)
      g += 1
    }
    java.util.Arrays.sort(hs)
    var dedup = 0
    g = 0
    while (g < m) {
      if (dedup == 0 || hs(dedup - 1) != hs(g)) { hs(dedup) = hs(g); dedup += 1 }
      g += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, dedup))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash computed directly from text bytes — the fused form of
  * `SimHash64(WordShingles(text, k))`, hashing k-word-gram byte slices
  * in place like [[MinHashTextSignature]]. SimHash votes are NOT
  * idempotent, so unlike minhash the fusion must replicate WordShingles'
  * dedup: grams are deduped by their 64-bit hash, which equals
  * dedup-by-content unless two distinct grams of ONE doc collide in
  * xxhash64 (~1e-15 at hundreds of grams — accepted; blocking is
  * probabilistic anyway and candidates are exact-verified). Fewer than
  * k words → 0L, matching SimHash64 over an empty gram array. */
case class SimHashTextSignature(child: Expression, k: Int)
    extends UnaryExpression with UnaryEvalCodegen {
  require(k >= 1)

  override def dataType: DataType = LongType
  override protected def castResult(x: String): String =
    s"((java.lang.Long) $x).longValue()"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nWords = 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) nWords += 1
      i += 1
    }
    if (nWords < k) return java.lang.Long.valueOf(0L)
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (s.getByte(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[java.lang.Long]()
    val m = nWords - k + 1
    var g = 0
    while (g < m) {
      val gStart = starts(g)
      val gEnd = if (g + k < nWords) starts(g + k) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + gStart, gEnd - gStart, 0L)
      if (seen.add(h)) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      g += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
