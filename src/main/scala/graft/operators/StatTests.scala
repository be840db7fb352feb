package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ClickHouse two-sample statistical tests — `welchTTest`,
  * `mannWhitneyUTest` and `kolmogorovSmirnovTest` — as one battery over
  * a numeric column split by a binary group label.
  *
  * Scale shape: the raw rows are touched exactly twice, both times by
  * combinable aggregates — (a) per-group power sums (Welch), (b) a
  * groupBy on the VALUE (rank/ECDF table). Every window below runs over
  * the distinct-value table, not the rows; for fixed-precision metrics
  * (2-decimal doubles in a bounded range) that table is
  * scale-invariant, so the single-partition window is a deliberate,
  * bounded driver-side-sized step — the same justification as the
  * stop-gram tables in [[JaccardJoin]].
  *
  * Determinism: Welch runs on DECIMAL-exact power sums (values carry 2
  * decimals); Mann–Whitney average ranks are carried in integer HALVES
  * (2·rank is always whole) so the rank-sum is exact BIGINT; the KS
  * statistic is a max of |a/n₁ − b/n₂| cleared to integers — all
  * order-free, oracle-mirrorable bit-for-bit.
  */
object StatTests {

  /** Run the battery on `df(valCol)` split by boolean `isA`. Output one
    * row: (n_a, n_b, mean_a, mean_b, t_stat, welch_df, mw_u, ks_d) with
    * doubles µ-rounded (6).
    */
  def battery(df: DataFrame, valCol: String, isA: Column): DataFrame = {
    val v = col(valCol).cast(DecimalType(18, 4))
    val src = df.select(col(valCol), isA.as("__a"))
      .filter(col(valCol).isNotNull)

    // ---- Welch t from per-group exact power sums -------------------
    // (also carries the metric's min/max — free in the same combinable
    // pass — which seed the range buckets of the two-phase cumulative
    // sums below); referenced twice (bucket-seed broadcast + final
    // projection) — both lazy, like the pre-r20 shape: the duplicate
    // subtree runs as parallel stages inside the one job, which measures
    // cheaper than serializing an eager checkpoint job before it.
    val sums = src.groupBy().agg(
      count(when(col("__a"), 1)).as("na"),
      count(when(!col("__a"), 1)).as("nb"),
      sum(when(col("__a"), v)).cast("double").as("sa"),
      sum(when(!col("__a"), v)).cast("double").as("sb"),
      sum(when(col("__a"), v * v)).cast("double").as("qa"),
      sum(when(!col("__a"), v * v)).cast("double").as("qb"),
      min(col(valCol)).cast("double").as("__vmin"),
      max(col(valCol)).cast("double").as("__vmax"))

    // ---- rank/ECDF table: one row per distinct value ---------------
    val byVal = src.groupBy(col(valCol).as("__v"))
      .agg(count(when(col("__a"), 1)).as("__ca"),
        count(when(!col("__a"), 1)).as("__cb"))
    // Two-phase cumulative sums (guide §2.5): a bare Window.orderBy
    // would move EVERY distinct value to one partition (the
    // "No Partition Defined" scale-killer — one task sorts the whole
    // rank table). Instead: range-bucket the values off the min/max the
    // Welch pass already computed (bucket order == value order), run
    // the cumulative window PARTITIONED by bucket, and add each
    // bucket's offset — the totals of all lower buckets, a bounded
    // bucket-count-sized table joined back by broadcast. Same exact
    // integers, no global single-partition sort.
    val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val span = col("__vmax") - col("__vmin")
    // ONE broadcast of the stats row carries the bucket seeds AND the
    // group sizes the KS integers need downstream — a second
    // crossJoin(broadcast(sums)) here would re-execute the whole Welch
    // aggregation subtree once more per reference (measured: the first
    // r20 cut ran the events scan+agg three times)
    val bucketed = byVal
      .crossJoin(broadcast(sums.select(col("__vmin"), col("__vmax"),
        col("na").as("__na"), col("nb").as("__nb"))))
      .withColumn("__bk",
        when(span <= 0, lit(0)).otherwise(
          // coalesce: a NaN metric value buckets null — pin it to the
          // last bucket, where the in-bucket orderBy sorts it last,
          // exactly as the old global orderBy did
          coalesce(
            least(lit(nBuckets - 1),
              floor((col("__v").cast("double") - col("__vmin")) /
                (span / nBuckets)).cast("int")),
            lit(nBuckets - 1))))
      .drop("__vmin", "__vmax")
    val w = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = bucketed
      .withColumn("__la", sum(col("__ca")).over(w))
      .withColumn("__lb", sum(col("__cb")).over(w))
    // The cross-bucket carry is ALGEBRAIC, so no offsets join-back is
    // needed at all. With oa/ob = totals of all lower buckets:
    //   cuma = __la + oa,  cumb = __lb + ob
    //   __r2 (the DOUBLED tie-block average rank, 2·prevTotal + cnt+1,
    //   which keeps the whole Mann–Whitney reduction exact BIGINT) =
    //     [2(la+lb) − (ca+cb) + 1] + 2(oa+ob)      = __inr2 + 2(oa+ob)
    //   Σ __r2·ca over a bucket                    = Σ __inr2·ca + 2(oa+ob)·Σca
    //   the KS row value |cuma·nb − cumb·na|       = |__inks + c|,
    //     c = oa·nb − ob·na; its bucket max        = max(|max __inks + c|,
    //                                                    |min __inks + c|)
    //     (x ↦ |x+c| is convex — the max sits at an endpoint, exactly)
    // so each bucket reduces to seven integers on the window's own
    // partitioning (no exchange), and the ≤nBuckets bucket rows fold in
    // ONE bounded ordered pass (sort_array + aggregate) inside the final
    // global aggregation — the same single tiny-row stage the old global
    // rank aggregate already paid, with no broadcast and no extra
    // exchange.
    val bstats = inBucket
      .withColumn("__inr2",
        (col("__la") + col("__lb")) * 2 - col("__ca") - col("__cb") + 1)
      .withColumn("__inks",
        col("__la") * col("__nb") - col("__lb") * col("__na"))
      .groupBy(col("__bk"))
      .agg(sum(col("__inr2") * col("__ca")).as("__s1"),
        sum(col("__ca")).as("__sca"),
        max(col("__inks")).as("__kmax"), min(col("__inks")).as("__kmin"),
        max(col("__la")).as("__ta"), max(col("__lb")).as("__tb"),
        max(col("__na")).as("__bna"), max(col("__nb")).as("__bnb"))
    val foldInit = struct(lit(0L).as("oa"), lit(0L).as("ob"),
      lit(0L).as("r"), lit(0L).as("k"))
    def foldStep(na: Column, nb: Column)(acc: Column, x: Column): Column = {
      val c = acc("oa") * nb - acc("ob") * na
      struct(
        (acc("oa") + x("__ta")).as("oa"),
        (acc("ob") + x("__tb")).as("ob"),
        (acc("r") + x("__s1") +
          (acc("oa") + acc("ob")) * 2 * x("__sca")).as("r"),
        greatest(acc("k"), abs(x("__kmax") + c), abs(x("__kmin") + c))
          .as("k"))
    }
    val rankStats = bstats
      .groupBy()
      .agg(sort_array(collect_list(struct(col("__bk"), col("__s1"),
          col("__sca"), col("__kmax"), col("__kmin"), col("__ta"),
          col("__tb")))).as("__bs"),
        max(col("__bna")).as("__fna"), max(col("__bnb")).as("__fnb"))
      .select(aggregate(col("__bs"), foldInit,
          foldStep(col("__fna"), col("__fnb"))).as("__fold"),
        col("__fna"), col("__fnb"))
      // empty-input parity with the old global aggregates (null, not 0)
      .select(
        when(col("__fna").isNull, lit(null))
          .otherwise(col("__fold.r")).as("__r1x2"),
        when(col("__fna").isNull, lit(null))
          .otherwise(col("__fold.k")).as("__ksnum"),
        (col("__fna") * col("__fnb")).as("__ksden"))

    sums.crossJoin(rankStats).select(
      col("na").as("n_a"), col("nb").as("n_b"),
      round(col("sa") / col("na"), 6).as("mean_a"),
      round(col("sb") / col("nb"), 6).as("mean_b"),
      round((col("sa") / col("na") - col("sb") / col("nb")) /
        sqrt(varTerm("a") / col("na") + varTerm("b") / col("nb")), 6)
        .as("t_stat"),
      round(pow(varTerm("a") / col("na") + varTerm("b") / col("nb"), 2.0) /
        (pow(varTerm("a") / col("na"), 2.0) / (col("na") - 1) +
          pow(varTerm("b") / col("nb"), 2.0) / (col("nb") - 1)), 6)
        .as("welch_df"),
      // U₁ = R₁ − na(na+1)/2, with R₁ carried in exact halves:
      // (r1x2 − na(na+1))/2 — integer-or-half, exact in double
      round((col("__r1x2") - col("na") * (col("na") + 1)).cast("double") /
        lit(2.0d), 6).as("mw_u"),
      round(col("__ksnum").cast("double") / col("__ksden").cast("double"), 6)
        .as("ks_d"))
  }

  /** Sample variance s² of group g from its power sums:
    * (q − s²/n)/(n−1), written with this exact operand order on both
    * sides. */
  private def varTerm(g: String): Column =
    (col(s"q$g") - col(s"s$g") * col(s"s$g") / col(s"n$g")) /
      (col(s"n$g") - 1)

  /** Exact two-feature OLS per group — the closed-form (normal
    * equations, Cramer's rule) counterpart of ClickHouse's
    * `stochasticLinearRegression`: y = b0 + b1·x1 + b2·x2 fitted from
    * nine DECIMAL-exact power sums, so unlike SGD the fit is
    * deterministic, order-free, and one combinable aggregate pass.
    * Output: (group, n, b0, b1, b2, r2), µ-rounded (6). Degenerate
    * groups (singular X'X — a constant feature) yield NULL
    * coefficients via the det ≈ 0 guard.
    *
    * `x1`/`x2` must be integer-valued expressions and `yCol` a
    * fixed-decimal metric so every sum is exact; the double formula
    * trees are mirrored token-identically in the oracle SQL. */
  def ols2(
      df: DataFrame, groupCol: String, x1: Column, x2: Column,
      yCol: String): DataFrame = {
    val y = col(yCol).cast(DecimalType(18, 4))
    val x1d = x1.cast(DecimalType(18, 4)); val x2d = x2.cast(DecimalType(18, 4))
    val sums = df
      .filter(col(yCol).isNotNull)
      .groupBy(col(groupCol)).agg(
        count(lit(1)).cast("double").as("n"),
        sum(x1d).cast("double").as("s1"),
        sum(x2d).cast("double").as("s2"),
        sum(x1d * x1d).cast("double").as("s11"),
        sum(x2d * x2d).cast("double").as("s22"),
        sum(x1d * x2d).cast("double").as("s12"),
        sum(y).cast("double").as("sy"),
        sum((x1d * y).cast(DecimalType(38, 8))).cast("double").as("s1y"),
        sum((x2d * y).cast(DecimalType(38, 8))).cast("double").as("s2y"),
        sum((y * y).cast(DecimalType(38, 8))).cast("double").as("syy"))
    val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
    val s11 = col("s11"); val s22 = col("s22"); val s12 = col("s12")
    val sy = col("sy"); val s1y = col("s1y"); val s2y = col("s2y")
    val syy = col("syy")
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0r = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1r = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2r = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    val guard = abs(det) > lit(1e-6d)
    val derived = sums
      .withColumn("b0r", when(guard, b0r))
      .withColumn("b1r", when(guard, b1r))
      .withColumn("b2r", when(guard, b2r))
    derived.select(col(groupCol), col("n").cast("long").as("n"),
      round(col("b0r"), 6).as("b0"),
      round(col("b1r"), 6).as("b1"),
      round(col("b2r"), 6).as("b2"),
      round(lit(1.0d) -
        (syy - col("b0r") * sy - col("b1r") * s1y - col("b2r") * s2y) /
        (syy - sy * sy / n), 6).as("r2"))
  }

  /** ClickHouse `rankCorr(x, y)` — Spearman rank correlation per group,
    * with tie-averaged ranks. Ranks are carried DOUBLED (2·rank is
    * always whole: `2·rank() + ties − 1`), making every power sum exact
    * DECIMAL(38,0) integer arithmetic; the doubling cancels in the
    * correlation, so the result equals Spearman on true average ranks.
    * Output: (group, n, rank_corr) with rank_corr µ-rounded (6).
    *
    * Shape: the two rank windows and the final aggregate share one
    * group-hash exchange (two in-partition sorts, one per variable). */
  def rankCorr(
      df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    def r2(c: String): Column = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col(c))
      val ties = Window.partitionBy(col(groupCol), col(c))
      (rank().over(w).cast("long") * 2 + count(lit(1)).over(ties) - 1)
        .cast(DecimalType(38, 0))
    }
    val ranked = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("__rx", r2(xCol))
      .withColumn("__ry", r2(yCol))
    val sums = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__rx")).cast("double").as("sx"),
      sum(col("__rx") * col("__rx")).cast("double").as("sxx"),
      sum(col("__rx") * col("__ry")).cast("double").as("sxy"),
      sum(col("__ry")).cast("double").as("sy"),
      sum(col("__ry") * col("__ry")).cast("double").as("syy"))
    val n = col("n").cast("double")
    sums.select(col(groupCol), col("n"),
      round((n * col("sxy") - col("sx") * col("sy")) /
        sqrt((n * col("sxx") - col("sx") * col("sx")) *
          (n * col("syy") - col("sy") * col("sy"))), 6).as("rank_corr"))
  }
}
