package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles, sort-based.
  *
  * Spark's built-in `percentile` aggregate buffers a value→count map of
  * EVERY group value inside ObjectHashAggregate — the partial aggregates
  * are as large as the data, so map-side combine reduces nothing and the
  * shuffle + serialization cost is O(data) per attempt (measured 3× the
  * whole-query cost of the sort form at sf0.1). This operator instead
  * ranks values with a window over one hash-shuffle-by-key sort —
  * every row crosses the wire exactly once, sorting distributes/spills,
  * and the final aggregate keeps only the 2 boundary rows per quantile —
  * then interpolates exactly like SQL `percentile_cont` / DuckDB
  * `quantile_cont`: index (n-1)·p, linear between floor/ceil neighbors.
  *
  * For very low group cardinality the sort parallelism is bounded by
  * group count (same bound applies to the final reduce of any grouped
  * aggregate); for high-cardinality approximate needs use
  * `percentile_approx` (t-digest) instead.
  */
object Quantiles {

  def exact(
      df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[(Double, String)], scale: Int = 4): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val wn = Window.partitionBy(col(keyCol))
    val ranked = df
      .select(col(keyCol), col(valCol).cast("double").as("__v"))
      // percentile_cont semantics ignore NULLs (incl. failed casts);
      // without this filter a null ranks first and shifts every index
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))

    val aggs: Seq[Column] = ps.flatMap { case (p, name) =>
      val idx = (col("__n") - 1) * lit(p)      // 0-based fractional index
      val lo = floor(idx) + 1                  // 1-based rank of lower neighbor
      Seq(
        max(when(col("__rn") === lo, col("__v"))).as(s"__lo_$name"),
        max(when(col("__rn") === lo + 1, col("__v"))).as(s"__hi_$name"),
        max(idx - floor(idx)).as(s"__f_$name")) // per-group constant
    }
    val outs: Seq[Column] = ps.map { case (_, name) =>
      val vLo = col(s"__lo_$name")
      val vHi = coalesce(col(s"__hi_$name"), vLo) // p = 1.0 has no upper
      round(vLo + col(s"__f_$name") * (vHi - vLo), scale).as(name)
    }
    ranked.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol) +: outs: _*)
  }

  /** Exact grouped quantiles WITHOUT the per-group global sort — the
    * [[exact]] scale path. Three combinable passes:
    *
    *  1. (min, max, n) per key — a plain combinable aggregate;
    *  2. linear-bin histogram: count per (key, bucket) over
    *     `nBuckets` equal-width bins of [min, max] — again combinable,
    *     so the full data crosses the shuffle only as partial counts;
    *     a window over the BUCKET TABLE (≤ groups × nBuckets rows, not
    *     data rows) turns counts into per-bucket base ranks;
    *  3. each target rank (the percentile_cont lower/upper neighbor
    *     ranks) lands in exactly one bucket; only THOSE buckets' rows
    *     are re-scanned (broadcast semi-join on (key, bucket)), sorted
    *     within (key, bucket) — expected n/nBuckets rows each — and the
    *     rows at the exact global ranks are kept and interpolated with
    *     the same (n−1)·p arithmetic as [[exact]], so the two forms are
    *     value-identical.
    *
    * No stage sorts more than the straddled buckets (expected
    * 2·|ps|·groups·n/nBuckets rows), and stage-3 parallelism is the
    * straddled-bucket count, not the group count — the two reasons
    * [[exact]] goes near-linear at low group cardinality. Worst case
    * (all values equal, or pathological skew into one bin) degrades to
    * sorting that bin — i.e. to [[exact]]'s behavior, never worse.
    * Group stats and the needed-bucket list are broadcast: the contract
    * is group cardinality small enough for a groups-sized broadcast
    * (the [[exact]] contract already was "low group cardinality"; for
    * high cardinality use [[approx]]/t-digest). */
  def exactBucketed(
      df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[(Double, String)], scale: Int = 4,
      nBuckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // the key rides inside a single-field struct: struct equality
    // treats null fields as equal (row semantics), so the equi-joins
    // below keep a NULL-key group exactly like [[exact]]'s window
    // partitioning does — a bare-column join would silently drop it
    val vals = df
      .select(struct(col(keyCol)).as("__k"),
        col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    // bin range stats EXCLUDE NaN: max() over a NaN-carrying group
    // returns NaN (NaN sorts greatest), which would poison the bucket
    // arithmetic below into NULL buckets and silently drop the whole
    // group from the equi-joins. NaN rows still count toward __n and
    // are routed to the TOP bucket instead — NaN sorts after every
    // real value in Spark, so the global rank order (and therefore
    // value-identity with [[exact]], where NaN ranks last and NaN-
    // touching quantiles come out NaN) is preserved. An all-NaN group
    // has NULL __mn/__mx, but then every row takes the isnan branch.
    val stats = vals.groupBy(col("__k")).agg(
      min(when(!isnan(col("__v")), col("__v"))).as("__mn"),
      max(when(!isnan(col("__v")), col("__v"))).as("__mx"),
      count(lit(1)).as("__n"))

    val bucket = when(isnan(col("__v")), lit(nBuckets - 1)).otherwise(
      when(col("__mx") === col("__mn"), lit(0)).otherwise(
        least(lit(nBuckets - 1), greatest(lit(0),
          floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn"))
            * nBuckets).cast("int")))))
    val withB = vals.join(broadcast(stats), "__k")
      .select(col("__k"), col("__v"), bucket.as("__b"))

    val bCounts = withB.groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val wb = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bCounts.withColumn("__base",
      coalesce(sum(col("__c")).over(wb), lit(0L)))

    // the percentile_cont neighbor ranks per (key, quantile)
    val rankRows = ps.map { case (p, name) =>
      val idx = (col("__n") - 1) * lit(p)
      struct(lit(name).as("q"),
        (floor(idx).cast("long") + 1L).as("rlo"),
        least(floor(idx).cast("long") + 2L, col("__n")).as("rhi"),
        (idx - floor(idx)).as("frac"))
    }
    val need = stats
      .select(col("__k"), explode(array(rankRows: _*)).as("t"))
      .select(col("__k"), col("t.q"), col("t.frac"),
        explode(array(
          struct(lit("lo").as("side"), col("t.rlo").as("r")),
          struct(lit("hi").as("side"), col("t.rhi").as("r")))).as("s"))
      .select(col("__k"), col("q"), col("frac"),
        col("s.side").as("side"), col("s.r").as("r"))
    val needB = need.join(cum, Seq("__k"))
      .filter(col("r") > col("__base") && col("r") <= col("__base") + col("__c"))
      .select(col("__k"), col("__b"), col("q"), col("frac"),
        col("side"), col("r"))

    // stage 3: sort ONLY the straddled buckets, pick the exact ranks
    val buckets = needB.select(col("__k"), col("__b")).distinct()
      .join(cum.select(col("__k"), col("__b"), col("__base")),
        Seq("__k", "__b"))
    val wS = Window.partitionBy(col("__k"), col("__b")).orderBy(col("__v"))
    val rankedC = withB
      .join(broadcast(buckets), Seq("__k", "__b"))
      .withColumn("__rg", row_number().over(wS) + col("__base"))
    // fresh column names break the shared lineage with rankedC (both
    // descend from `stats`), which otherwise trips the ambiguous
    // self-join check
    val needSel = needB.select(col("__k").as("__nk"), col("__b").as("__nb"),
      col("q"), col("frac"), col("side"), col("r"))
    val picked = rankedC
      .join(broadcast(needSel), col("__k") === col("__nk") &&
        col("__b") === col("__nb") && col("__rg") === col("r"))
      .select(col("__k"), col("q"), col("frac"), col("side"), col("__v"))

    val perQ = picked.groupBy(col("__k"), col("q"))
      .agg(max(when(col("side") === "lo", col("__v"))).as("__vlo"),
        max(when(col("side") === "hi", col("__v"))).as("__vhi"),
        max(col("frac")).as("__f"))
      .select(col("__k"), col("q"),
        round(col("__vlo") + col("__f") * (col("__vhi") - col("__vlo")),
          scale).as("__qv"))
    val outs = ps.map { case (_, name) =>
      max(when(col("q") === name, col("__qv"))).as(name)
    }
    perQ.groupBy(col("__k")).agg(outs.head, outs.tail: _*)
      .withColumn(keyCol, col("__k").getField(keyCol))
      .select(col(keyCol) +: ps.map { case (_, n) => col(n) }: _*)
  }

  /** Approximate grouped quantiles via `percentile_approx` — Spark's
    * built-in quantile sketch (ApproximatePercentile over
    * QuantileSummaries, the Greenwald-Khanna family t-digest-style
    * mergeable summary). This is the high-group-cardinality / 100 TB
    * path [[exact]]'s scaladoc points at: partial aggregates are
    * CONSTANT-SIZE sketches (O(accuracy·log n), not O(group values)),
    * so map-side combine genuinely reduces, the shuffle carries
    * sketches instead of data, and no sort is needed. Guaranteed rank
    * error ≤ 1/accuracy; returns an observed value, not an
    * interpolation. */
  def approx(
      df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[(Double, String)], accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map { case (p, name) =>
      percentile_approx(col(valCol).cast("double"), lit(p), lit(accuracy)).as(name)
    }
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[approx]] plus a per-quantile rank-error audit: for each
    * approximate value v and target rank p, recomputes the empirical CDF
    * bracket of v in one extra pass over the data and flags
    * `<name>_ok` = [frac(x < v) − tol ≤ p ≤ frac(x ≤ v) + tol] — the
    * two-sided form is exact under ties, where a single CDF point would
    * false-negative on heavy duplicates. The audit join broadcasts the
    * per-group quantile table (rows = groups, tiny by construction). */
  def approxWithRankCheck(
      df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[(Double, String)], accuracy: Int = 10000,
      tol: Double = 0.01): DataFrame =
    rankCheck(df, keyCol, valCol, approx(df, keyCol, valCol, ps, accuracy),
      ps, tol)

  /** Audit ANY per-group quantile table `a` (columns: keyCol + one DOUBLE
    * per `ps` name) against the empirical CDF of the raw data — the
    * shared back-end of [[approxWithRankCheck]] and the t-digest query
    * (q74). See [[approxWithRankCheck]] for the two-sided-under-ties
    * rationale. */
  def rankCheck(
      df: DataFrame, keyCol: String, valCol: String, a: DataFrame,
      ps: Seq[(Double, String)], tol: Double): DataFrame = {
    val joined = df
      .select(col(keyCol), col(valCol).cast("double").as("__v"))
      .join(broadcast(a), Seq(keyCol))
    val cdfAggs = ps.flatMap { case (_, name) =>
      Seq(
        (sum(when(col("__v") < col(name), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as(s"__lt_$name"),
        (sum(when(col("__v") <= col(name), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as(s"__le_$name"))
    }
    val vals = ps.map { case (_, name) => first(col(name)).as(name) }
    val oks = ps.map { case (p, name) =>
      ((col(s"__lt_$name") - tol <= p) && (col(s"__le_$name") + tol >= p))
        .as(s"${name}_ok")
    }
    val aggAll = vals ++ cdfAggs
    joined.groupBy(col(keyCol)).agg(aggAll.head, aggAll.tail: _*)
      .select(col(keyCol) +: (ps.map(p => col(p._2)) ++ oks): _*)
  }

  /** ClickHouse `quantileExactWeighted(q)(v, w)` for quarter quantiles
    * (q in {k/4}): the smallest value whose cumulative weight reaches
    * q·total — the "lower" exact reading, entirely in integer
    * arithmetic (`4·cumw ≥ k·tot`, no q·n rounding ambiguity), so the
    * result is reproducible bit-for-bit on any engine.
    *
    * Shape: rows collapse to a (key, value)-grouped weight table first
    * (combinable count — for fixed-precision values that table, not the
    * data, bounds everything downstream), then one key-hash window pass
    * and a min-filter aggregate on the same partitioning.
    *
    * `quarters` maps output column name → k (1=p25, 2=median, 3=p75).
    */
  def exactWeighted(
      df: DataFrame, keyCol: String, valCol: String, weightCol: String,
      quarters: Seq[(String, Int)]): DataFrame = {
    val byVal = df
      .groupBy(col(keyCol), col(valCol).as("__v"))
      .agg(sum(col(weightCol)).as("__w"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
    val ranked = byVal
      .withColumn("__cumw", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wAll))
    val aggs = quarters.map { case (name, k) =>
      min(when(col("__cumw") * 4 >= col("__tot") * k, col("__v"))).as(name)
    } :+ max(col("__tot")).as("total_weight")
    ranked.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Tukey-fence outlier summary per key (the grouped form of
    * ClickHouse `seriesOutliersDetectTukey`): quartiles via [[exact]]
    * (percentile_cont interpolation, scale-4 rounded — the q29-proven
    * parity surface), fences q1 ∓ k·IQR, and the outlier census.
    * Output: (key, n, q1, q3, lo_fence, hi_fence, n_outliers,
    * min_outlier, max_outlier) — the min/max are NULL when no point
    * falls outside the fences.
    *
    * Shape: the quartile pass is [[exact]]'s one sorted key-hash
    * shuffle; the census re-scans the raw rows once against the
    * BROADCAST per-key fence table (rows = keys). */
  def tukeyOutliers(
      df: DataFrame, keyCol: String, valCol: String,
      k: Double = 1.5): DataFrame = {
    val q = exact(df, keyCol, valCol, Seq(0.25 -> "q1", 0.75 -> "q3"))
      .withColumn("lo_fence", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi_fence", col("q3") + lit(k) * (col("q3") - col("q1")))
    val v = col(valCol).cast("double")
    df.select(col(keyCol), v.as("__v"))
      .filter(col("__v").isNotNull)
      .join(broadcast(q), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        first(col("q1")).as("q1"), first(col("q3")).as("q3"),
        // NO rounding on the fences: they end in an exact 5th-decimal 5
        // (4-decimal quartiles × 1.5), so any round-4 is a guaranteed
        // half-case where the engines' half-rules diverge on the binary
        // vs shortest-decimal reading; the raw double is bit-identical
        // on both sides because the inputs and expression are
        first(col("lo_fence")).as("lo_fence"),
        first(col("hi_fence")).as("hi_fence"),
        count(when(col("__v") < col("lo_fence") ||
          col("__v") > col("hi_fence"), 1)).as("n_outliers"),
        min(when(col("__v") < col("lo_fence") ||
          col("__v") > col("hi_fence"), col("__v"))).as("min_outlier"),
        max(when(col("__v") < col("lo_fence") ||
          col("__v") > col("hi_fence"), col("__v"))).as("max_outlier"))
  }
}
