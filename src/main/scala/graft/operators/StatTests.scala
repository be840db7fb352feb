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
    val sums = src.groupBy().agg(
      count(when(col("__a"), 1)).as("na"),
      count(when(!col("__a"), 1)).as("nb"),
      sum(when(col("__a"), v)).cast("double").as("sa"),
      sum(when(!col("__a"), v)).cast("double").as("sb"),
      sum(when(col("__a"), v * v)).cast("double").as("qa"),
      sum(when(!col("__a"), v * v)).cast("double").as("qb"))

    // ---- rank/ECDF table: one row per distinct value ---------------
    val byVal = src.groupBy(col(valCol).as("__v"))
      .agg(count(when(col("__a"), 1)).as("__ca"),
        count(when(!col("__a"), 1)).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVal
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      // DOUBLED average rank of the tie-block ending here:
      // 2·prevTotal + (cnt+1) — keeping ranks in integer halves makes
      // the whole Mann–Whitney reduction exact BIGINT arithmetic
      .withColumn("__r2",
        (col("__cuma") + col("__cumb") - col("__ca") - col("__cb")) * 2 +
          col("__ca") + col("__cb") + 1)
    // ks numerator in exact integers too: |F_a − F_b| =
    // |cuma·nb − cumb·na| / (na·nb) — the max is over integers, order-free
    val rankStats = ranked
      .crossJoin(broadcast(sums.select(col("na").as("__na"),
        col("nb").as("__nb"))))
      .groupBy().agg(
        sum(col("__r2") * col("__ca")).as("__r1x2"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("__ksnum"),
        max(col("__na") * col("__nb")).as("__ksden"))

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
