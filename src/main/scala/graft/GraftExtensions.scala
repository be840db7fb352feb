package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Add, And, BitwiseOr, CaseWhen, Cast, EqualTo, Expression, ExpressionInfo, GreaterThan, If, IsNotNull, LambdaFunction, Literal, Not, Subtract, UnresolvedNamedLambdaVariable, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

import graft.functions._

/** SQL-surface registration of the engine's custom Catalyst functions —
  * the `SparkSessionExtensions` path, so `spark.sql("SELECT
  * graft_topk(term, 10) ...")` works anywhere plain SQL is the
  * interface (notebooks, JDBC gateways, `spark-sql`). Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (Sessions.builder does).
  *
  * Registered names (all ClickHouse-parity semantics, each backed by
  * the spec-pinned implementation the DataFrame API uses — this class
  * adds NAMES, not new code paths):
  *  - `graft_xxhash64(x, ...)`      seed-0 xxhash64 (CH `xxHash64`;
  *                                  Spark's builtin pins seed 42)
  *  - `graft_uniq_upto(x, n)`       ClickHouse `uniqUpTo(n)`
  *  - `graft_topk(x, k)`            ClickHouse `topK` (SpaceSaving;
  *                                  array of (item, est, err) structs)
  *  - `graft_bitmap_distinct(x)`    ClickHouse `groupBitmap` (exact
  *                                  distinct count of BIGINTs)
  *  - `graft_bitmap_state(x)`       ClickHouse `groupBitmapState`
  *                                  (serialized roaring bitmap)
  *  - `graft_tdigest(x, p)`         ClickHouse `quantileTDigest(p)`
  *  - `graft_normalize(s)`          text canonicalization pass
  *  - `graft_winnow(s, k, w)`       winnowing fingerprints
  *  - `graft_sum_map(ks, vs)`       ClickHouse `sumMap` (parallel arrays)
  *  - `graft_histogram(x, bins)`    ClickHouse adaptive `histogram(bins)`
  *  - `graft_retention(c1, ..)`     ClickHouse `retention` flag array
  *  - `graft_window_funnel(w[, 'modes'], ts, c1, ..)`
  *                                  ClickHouse `windowFunnel` incl.
  *                                  strict_* modes (comma-separated)
  *  - `graft_image_dhash/ahash(b)`, `graft_audio_hash(b)`,
  *    `graft_video_hash(b)`       perceptual media fingerprints (NULL
  *                                  for payloads with no decode path)
  *  - `graft_sequence_match('p', ts, c1, ..)` / `graft_sequence_count`
  *                                  ClickHouse `sequenceMatch`/`Count`
  *                                  ((?N) steps, any-gap, time bounds)
  *  - `graft_delta_sum(ts, tie, v)` ClickHouse `deltaSum` in explicit
  *                                  (ts, tie) fold order — CH relies on
  *                                  insertion order, which a distributed
  *                                  engine must name, not assume
  *
  * Integer/percentile parameters must be foldable literals (the same
  * contract as Spark's own `approx_percentile` accuracy argument).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "agg_funcs", "4.0.0", "", "built-in")

  private def lit(e: Expression, what: String): Any = e match {
    case Literal(v, _) if v != null => v
    case _ => throw new IllegalArgumentException(
      s"$what must be a non-null literal, got ${e.sql}")
  }

  private def intLit(e: Expression, what: String): Int = lit(e, what) match {
    case i: Int => i
    // exact, not truncating: a BIGINT literal like 2^32+1 must fail
    // loudly, not silently become 1
    case l: Long => java.lang.Math.toIntExact(l)
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleLit(e: Expression, what: String): Double =
    lit(e, what) match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }

  private def agg(e: org.apache.spark.sql.catalyst.expressions.aggregate
      .AggregateFunction): Expression =
    e.toAggregateExpression(isDistinct = false)

  /** An analyzer-resolvable call to a builtin — the same node the SQL
    * parser emits for `name(args...)`. */
  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toSeq, isDistinct = false)

  private def lamVar(name: String) =
    UnresolvedNamedLambdaVariable(Seq(name))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in plan rewrite: count(DISTINCT bigint) → roaring bitmap
    // (see graft.plans.RewriteExactDistinct for the flag + rationale)
    ext.injectOptimizerRule(_ => graft.plans.RewriteExactDistinct)

    ext.injectFunction((FunctionIdentifier("graft_xxhash64"),
      info("graft_xxhash64", "xxhash64 with seed 0 (ClickHouse parity)"),
      (args: Seq[Expression]) => XxHash64(args, 0L)))

    ext.injectFunction((FunctionIdentifier("graft_uniq_upto"),
      info("graft_uniq_upto", "exact distinct count capped at n (+1)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_uniq_upto(x, n)")
        agg(BoundedDistinct(args.head, intLit(args(1), "n")))
      }))

    ext.injectFunction((FunctionIdentifier("graft_topk"),
      info("graft_topk", "SpaceSaving heavy hitters: (item, est, err)[]"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_topk(x, capacity)")
        agg(SpaceSavingTopK(args.head, intLit(args(1), "capacity")))
      }))

    ext.injectFunction((FunctionIdentifier("graft_bitmap_distinct"),
      info("graft_bitmap_distinct", "exact distinct BIGINTs via roaring"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_bitmap_distinct(x)")
        agg(GroupBitmap(args.head))
      }))

    ext.injectFunction((FunctionIdentifier("graft_bitmap_state"),
      info("graft_bitmap_state", "serialized roaring bitmap of BIGINTs"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_bitmap_state(x)")
        agg(GroupBitmapState(args.head))
      }))

    ext.injectFunction((FunctionIdentifier("graft_tdigest"),
      info("graft_tdigest", "t-digest quantile at literal p"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_tdigest(x, p)")
        agg(TDigestQuantiles(args.head, Seq(doubleLit(args(1), "p"))))
      }))

    ext.injectFunction((FunctionIdentifier("graft_normalize"),
      info("graft_normalize", "control-strip → NFC → ws collapse → trim"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_normalize(s)")
        NormalizeText(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "winnowing fingerprints over k-grams, window w"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_winnow(s, k, w)")
        WinnowFingerprints(args.head, intLit(args(1), "k"),
          intLit(args(2), "w"))
      }))

    ext.injectFunction((FunctionIdentifier("graft_sum_map"),
      info("graft_sum_map",
        "ClickHouse sumMap: per-key DECIMAL sums of parallel arrays"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_sum_map(keys, values)")
        agg(MapCombineAgg(args.head, args(1), MapCombine.Sum))
      }))

    ext.injectFunction((FunctionIdentifier("graft_histogram"),
      info("graft_histogram",
        "ClickHouse adaptive histogram(bins): (x, w)[] centroids"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_histogram(x, bins)")
        agg(HistogramAgg(args.head, intLit(args(1), "bins")))
      }))

    // The next three compose EXISTING pinned pieces (max/least,
    // collect+sort gather, WindowFunnelExpr, higher-order array ops)
    // into the ClickHouse call shapes — still no new algorithm code.
    // Built as RAW catalyst trees (UnresolvedFunction/LambdaFunction,
    // exactly what the SQL parser emits) so the analyzer resolves them
    // in place; Column-bridge trees do not resolve inside injected
    // functions.
    ext.injectFunction((FunctionIdentifier("graft_retention"),
      info("graft_retention",
        "ClickHouse retention(cond1..condN): [r1, r1&r2, ...] per group"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.size <= 32,
          "graft_retention(cond1, ..., condN), 1..32 conditions")
        def held(c: Expression): Expression =
          fn("max", If(c, Literal(1), Literal(0)))
        val anchor = held(args.head)
        val rs = anchor +: args.tail.map(c => fn("least", anchor, held(c)))
        fn("array", rs.map(Cast(_, IntegerType)): _*)
      }))

    ext.injectFunction((FunctionIdentifier("graft_window_funnel"),
      info("graft_window_funnel",
        "ClickHouse windowFunnel(w_us[, 'modes'])(ts_us, cond1, ...)"),
      (args: Seq[Expression]) => {
        require(args.size >= 3,
          "graft_window_funnel(window_us[, 'modes'], ts_us, cond1, cond2, ...)")
        val windowUs = this.lit(args.head, "window_us") match {
          case l: Long => l
          case i: Int => i.toLong
          case other => throw new IllegalArgumentException(
            s"window_us must be an integer literal, got $other")
        }
        val (modes, rest) = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            (s.toString.split(",").map(_.trim).filter(_.nonEmpty).toSet,
              args.drop(2))
          // a STRING-typed non-literal here is a user passing modes
          // through a column/expression: name the actual mistake
          // instead of letting the arg fall through to the timestamp
          // slot and fail as a confusing RequireMicrosLong type error
          // (r9 ADVICE)
          case e if e.resolved &&
              e.dataType == org.apache.spark.sql.types.StringType =>
            throw new IllegalArgumentException(
              "graft_window_funnel: the modes argument must be a string " +
                s"LITERAL (e.g. 'strict_order'), got expression ${e.sql}")
          case _ => (Set.empty[String], args.drop(1))
        }
        val known = Set("strict_deduplication", "strict_order",
          "strict_increase")
        require(modes.subsetOf(known),
          s"unknown windowFunnel modes: ${(modes -- known).mkString(", ")}")
        val ts = rest.head
        val conds = rest.tail
        require(conds.size >= 2 && conds.size <= 62,
          s"2..62 funnel steps, got ${conds.size}")
        val mask = conds.zipWithIndex
          .map { case (c, i) =>
            CaseWhen(Seq((c, Literal(1L << i))), Some(Literal(0L))) }
          .reduce[Expression](BitwiseOr(_, _))
        // mask-0 events are inert unless strict_order (FunnelScan
        // contract), so the gather keeps every non-null-ts event;
        // RequireMicrosLong rejects TIMESTAMP inputs at analysis (a
        // silent cast would be seconds, off by 1e6 vs window_us)
        val tsUs = RequireMicrosLong(ts, "ts_us")
        val item = CaseWhen(Seq((IsNotNull(tsUs),
          fn("struct", tsUs, mask))), None)
        WindowFunnelExpr(fn("sort_array", fn("collect_list", item)),
          windowUs, conds.size,
          strictDedup = modes("strict_deduplication"),
          strictOrder = modes("strict_order"),
          strictIncrease = modes("strict_increase"))
      }))

    ext.injectFunction((FunctionIdentifier("graft_image_dhash"),
      info("graft_image_dhash", "perceptual dHash of a BMP payload"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_image_dhash(payload)")
        ImageDHash(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("graft_image_ahash"),
      info("graft_image_ahash", "perceptual aHash of a BMP payload"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_image_ahash(payload)")
        ImageAHash(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("graft_audio_hash"),
      info("graft_audio_hash", "energy-envelope hash of a WAV payload"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_audio_hash(payload)")
        AudioEnergyHash(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("graft_video_hash"),
      info("graft_video_hash", "temporal-mean dHash of a GIF payload"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_video_hash(payload)")
        VideoAvgHash(args.head)
      }))

    def sequenceGather(modeArgs: Seq[Expression]): (String, Expression) = {
      val pattern = this.lit(modeArgs.head, "pattern") match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"pattern must be a string literal, got $other")
      }
      val ts = modeArgs(1)
      val conds = modeArgs.drop(2)
      require(conds.nonEmpty && conds.size <= 62,
        s"1..62 conditions, got ${conds.size}")
      // fail at registration, not lazily inside a task: a malformed
      // pattern or a (?N) past the supplied condition count would
      // otherwise throw per-executor (bad pattern) or silently never
      // match (ClickHouse errors on out-of-range references)
      val compiled = graft.functions.SequencePattern.compile(pattern)
      val maxRef = compiled.conds.max
      require(maxRef <= conds.size,
        s"pattern references condition (?$maxRef) but only " +
          s"${conds.size} conditions were supplied")
      val mask = conds.zipWithIndex
        .map { case (c, i) =>
          CaseWhen(Seq((c, Literal(1L << i))), Some(Literal(0L))) }
        .reduce[Expression](BitwiseOr(_, _))
      // ClickHouse collects ONLY events matching >= 1 condition; the
      // null branch drops the rest at collect_list
      val tsUs = RequireMicrosLong(ts, "ts_us")
      val item = CaseWhen(Seq((And(IsNotNull(tsUs),
        Not(EqualTo(mask, Literal(0L)))),
        fn("struct", tsUs, mask))), None)
      (pattern, fn("sort_array", fn("collect_list", item)))
    }

    ext.injectFunction((FunctionIdentifier("graft_sequence_match"),
      info("graft_sequence_match",
        "ClickHouse sequenceMatch('pattern')(ts_us, cond1, ...)"),
      (args: Seq[Expression]) => {
        require(args.size >= 3,
          "graft_sequence_match('pattern', ts_us, cond1, ...)")
        val (pattern, arr) = sequenceGather(args)
        SequenceMatchExpr(arr, pattern)
      }))

    ext.injectFunction((FunctionIdentifier("graft_sequence_count"),
      info("graft_sequence_count",
        "ClickHouse sequenceCount('pattern')(ts_us, cond1, ...)"),
      (args: Seq[Expression]) => {
        require(args.size >= 3,
          "graft_sequence_count('pattern', ts_us, cond1, ...)")
        val (pattern, arr) = sequenceGather(args)
        SequenceCountExpr(arr, pattern)
      }))

    ext.injectFunction((FunctionIdentifier("graft_delta_sum"),
      info("graft_delta_sum",
        "ClickHouse deltaSum over (ts, tie)-ordered values"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_delta_sum(ts, tie, v)")
        val Seq(ts, tie, v) = args
        // NULL values contribute no delta and the chain bridges them
        // (collect_list drops the null struct) — the deltaSum contract
        val item = CaseWhen(Seq((IsNotNull(v), fn("named_struct",
          Literal("t"), RequireMicrosLong(ts, "ts"),
          Literal("tie"), RequireMicrosLong(tie, "tie"),
          Literal("v"), Cast(v, DecimalType(18, 4))))), None)
        val arr = fn("sort_array", fn("collect_list", item))
        def vsOf: Expression = {
          val x = lamVar("gds_x")
          fn("transform", arr,
            LambdaFunction(UnresolvedExtractValue(x, Literal("v")), Seq(x)))
        }
        val n1 = fn("greatest", Subtract(fn("size", vsOf), Literal(1)),
          Literal(0))
        val (a, b) = (lamVar("gds_a"), lamVar("gds_b"))
        val ds = fn("zip_with",
          fn("slice", vsOf, Literal(1), n1),
          fn("slice", vsOf, Literal(2), n1),
          LambdaFunction(Subtract(b, a), Seq(a, b)))
        val d = lamVar("gds_d")
        val pos = fn("filter", ds,
          LambdaFunction(GreaterThan(d, Literal(0)), Seq(d)))
        val (acc, e) = (lamVar("gds_acc"), lamVar("gds_e"))
        val total = fn("aggregate", pos,
          Cast(Literal(0), DecimalType(28, 4)),
          LambdaFunction(Cast(Add(acc, e), DecimalType(28, 4)),
            Seq(acc, e)))
        Cast(total, DoubleType)
      }))
  }
}
