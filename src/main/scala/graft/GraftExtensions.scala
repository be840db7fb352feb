package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

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
  }
}
