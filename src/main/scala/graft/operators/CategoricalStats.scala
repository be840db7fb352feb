package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ClickHouse categorical-statistics aggregates: `entropy(x)` per
  * group, and the association pair `cramersV(x, y)` / `theilsU(x, y)`
  * computed from one shared contingency table.
  *
  * Shape: everything reduces to exact integer contingency counts first
  * (`groupBy(x, y).count` — one key-hash shuffle over the raw rows);
  * every subsequent stage operates on the contingency table, whose size
  * is |X|·|Y| — for categorical columns this is scale-INVARIANT, so at
  * 100 TB the raw data is touched exactly once, by a combinable count.
  * All floating-point terms (`c·ln c` etc.) are computed from exact
  * integers with the identical IEEE expression tree as the SQL oracle
  * and decimalized (CAST, the q50 discipline) before any reduction, so
  * results are bit-deterministic under any partitioning.
  */
object CategoricalStats {

  /** Per-key Shannon entropy of `valCol` in BITS (base 2), matching
    * ClickHouse `entropy` (AggregateFunctionEntropy.h divides the
    * nat-form sum by log 2). Output: (key, n, entropy), µ-rounded (6).
    *
    * Identity used: H = (ln n − (Σ c·ln c)/n) / ln 2 — each term
    * depends only on its own cell count, so the inner reduction is a
    * plain decimal-exact sum (the p·log p form would tie every term to
    * the group total and force a second pass). The ln 2 divisor is the
    * hardcoded correctly-rounded double (not `log2()` calls) so the
    * engine and the SQL oracle share one IEEE expression tree.
    */
  def entropy(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val cells = df.groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as("__c"))
    cells
      .withColumn("__clnc",
        (col("__c").cast("double") * log(col("__c").cast("double")))
          .cast(DecimalType(28, 12)))
      .groupBy(col(keyCol))
      .agg(sum(col("__c")).as("n"), sum(col("__clnc")).as("__s"))
      .select(col(keyCol), col("n"),
        round((log(col("n").cast("double")) -
          col("__s").cast("double") / col("n").cast("double")) /
          lit(0.6931471805599453), 6)
          .as("entropy"))
  }

  /** ClickHouse `categoricalInformationValue(x, label)` expanded to the
    * per-category Weight-of-Evidence table the IV sum is built from:
    * one row per category — (x, n_good, n_bad, woe, iv_term) with
    * WoE = ln((g/G)/(b/B)) written as ln(g·B / (b·G)) (one division,
    * exact-integer operands) and iv_term = (g/G − b/B)·WoE, both
    * µ-rounded (6). `IV = Σ iv_term` is left to the consumer so the
    * output itself has no cross-row float reduction at all.
    *
    * Same scale shape as [[entropy]]: one combinable count over the
    * raw rows; everything after is category-sized. Categories where
    * either class is absent get NULL woe/iv_term (the CH aggregate is
    * likewise undefined there) rather than ±Inf.
    */
  def informationValue(
      df: DataFrame, xCol: String, label: Column): DataFrame = {
    val cells = df.groupBy(col(xCol))
      .agg(count(when(label, 1)).as("n_good"),
        count(when(!label, 1)).as("n_bad"))
    val tot = cells.agg(sum(col("n_good")).as("__g"),
      sum(col("n_bad")).as("__b"))
    val g = col("n_good").cast("double"); val b = col("n_bad").cast("double")
    val woeRaw = log((g * col("__b").cast("double")) /
      (b * col("__g").cast("double")))
    cells.crossJoin(broadcast(tot))
      .select(col(xCol), col("n_good"), col("n_bad"),
        when(col("n_good") > 0 && col("n_bad") > 0,
          round(woeRaw, 6)).as("woe"),
        when(col("n_good") > 0 && col("n_bad") > 0,
          round((g / col("__g").cast("double") -
            b / col("__b").cast("double")) * woeRaw, 6)).as("iv_term"))
  }

  /** Association battery between two categorical columns from ONE
    * contingency table: chi², Cramér's V (ClickHouse `cramersV`) and
    * Theil's U = U(x|y) (ClickHouse `theilsU`). One output row:
    * (n, n_x, n_y, chi2, cramers_v, theils_u), doubles µ-rounded (6).
    *
    * χ² is computed as Σ_ij o_ij²/e_ij − n (algebraically equal to
    * Σ (o−e)²/e because Σo = Σe = n): the o²/e form needs ONLY the
    * observed cells, while the (o−e)² form would silently drop the
    * zero cells a groupBy never materializes — with e_ij = r_i·c_j/n;
    * V = sqrt(χ²/(n·min(|X|−1, |Y|−1)));
    * U(x|y) = (H(X) − H(X|Y))/H(X), with
    * H(X) = ln n − (Σ_i r_i ln r_i)/n and
    * H(X|Y) = (Σ_j c_j ln c_j − Σ_ij o_ij ln o_ij)/n — again the
    * c·ln c form so every reduction is over per-cell decimal terms.
    *
    * The contingency table and its margins are broadcast-sized, so the
    * three joins below never shuffle the (already tiny) cell table by
    * more than |X|·|Y| rows.
    */
  def association(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint()
    val rows = cells.groupBy(col(xCol)).agg(sum(col("__o")).as("__r"))
    val cols = cells.groupBy(col(yCol)).agg(sum(col("__o")).as("__cj"))
    val tot = cells.agg(
      sum(col("__o")).as("__n"),
      countDistinct(col(xCol)).as("n_x"),
      countDistinct(col(yCol)).as("n_y"))
    def clnc(c: org.apache.spark.sql.Column) =
      (c.cast("double") * log(c.cast("double"))).cast(DecimalType(28, 12))
    val terms = cells
      .join(broadcast(rows), xCol)
      .join(broadcast(cols), yCol)
      .crossJoin(broadcast(tot))
      .withColumn("__e",
        col("__r").cast("double") * col("__cj").cast("double") /
          col("__n").cast("double"))
      .withColumn("__chi",
        (col("__o").cast("double") * col("__o").cast("double") / col("__e"))
          .cast(DecimalType(28, 12)))
      .withColumn("__olno", clnc(col("__o")))
    val rSum = rows.agg(sum(clnc(col("__r"))).as("__rlnr"))
    val cSum = cols.agg(sum(clnc(col("__cj"))).as("__clnc"))
    terms
      .groupBy()
      .agg(max(col("__n")).as("n"), max(col("n_x")).as("n_x"),
        max(col("n_y")).as("n_y"),
        // mathematically ≥ 0; the greatest() guards the −ε a decimal
        // round-off could leave, which sqrt would turn into NaN
        greatest(sum(col("__chi")).cast("double") -
          max(col("__n")).cast("double"), lit(0.0d)).as("__chi2"),
        sum(col("__olno")).cast("double").as("__so"))
      .crossJoin(broadcast(rSum))
      .crossJoin(broadcast(cSum))
      .select(col("n"), col("n_x"), col("n_y"),
        round(col("__chi2"), 6).as("chi2"),
        round(sqrt(col("__chi2") / (col("n").cast("double") *
          least(col("n_x") - 1, col("n_y") - 1).cast("double"))), 6)
          .as("cramers_v"),
        round(
          (log(col("n").cast("double")) -
            col("__rlnr").cast("double") / col("n").cast("double") -
            (col("__clnc").cast("double") - col("__so")) /
              col("n").cast("double")) /
          (log(col("n").cast("double")) -
            col("__rlnr").cast("double") / col("n").cast("double")), 6)
          .as("theils_u"))
  }
}
