package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 operators: edit-distance similarity join, map-valued
  * aggregate combinators, adaptive histograms and the moment-statistics
  * battery. Same conventions as the other families: shared literals
  * between the Spark side and the oracle SQL, every query totally
  * ordered, int outputs cast BIGINT on both sides. */
object Round8 {

  /** q75's threshold: planted near-dup doc pairs sit at head edit
    * distance <= 4 while unrelated word-salad pairs start at ~37
    * (measured at sf0.01) — 8 keeps a wide margin on both sides. */
  val editDistMax = 8
  val editHeadChars = 80

  /** q75: exact edit-distance self-join over fixed-length document
    * heads ([[graft.operators.EditDistanceJoin]], Pass-Join pigeonhole
    * blocking) — the character-level near-dup detector that catches
    * small in-place edits Jaccard shingles over-penalize. Candidates
    * come from a complete segment/window hash join; only candidate
    * pairs run the banded Levenshtein. The oracle is the brute-force
    * all-pairs scan (fine at sf0.01; the operator exists precisely so
    * the corpus never pays that quadratic cost). */
  def q75EditDistJoin(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(s, dir, "documents")
      .filter(col("n_chars") >= editHeadChars)
      .select(col("doc_id"),
        substring(col("text"), 1, editHeadChars).as("head"))
    graft.operators.EditDistanceJoin
      .selfJoin(docs, "doc_id", "head", editDistMax)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** q76: ClickHouse `sumMap`/`maxMap` ([[graft.functions.MapCombine]])
    * as a TWO-LEVEL map plan — the `-State`/`-Merge` combinator shape:
    * per-(user, week) revenue maps built once from rows, then merged
    * per user by feeding level-1 maps back in via
    * (`map_keys`, `map_values`) — the second exchange carries one
    * bounded map per (user, week), never re-touching event rows.
    * `sumMap` gives lifetime totals per event type, `maxMap` over the
    * same weekly maps gives each type's best week. DECIMAL(18,4)
    * accumulation keeps both sides order-independent (`dsum`
    * discipline). */
  def q76SumMap(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MapCombine
    import org.apache.spark.sql.types.DecimalType
    val e = Tables.parallel(s, dir, "events")
    val wk = e
      .groupBy(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .agg(MapCombine.sumMap(
        array(col("event_type")),
        array(col("value").cast(DecimalType(18, 4)))).as("m"))
    wk.groupBy(col("user_id"))
      .agg(
        MapCombine.sumMap(map_keys(col("m")), map_values(col("m"))).as("tm"),
        MapCombine.maxMap(map_keys(col("m")), map_values(col("m"))).as("xm"))
      .select(col("user_id"), explode(col("tm")).as(Seq("event_type", "t")),
        col("xm"))
      .select(col("user_id"), col("event_type"),
        col("t").cast("double").as("total"),
        element_at(col("xm"), col("event_type")).cast("double")
          .as("weekly_max"))
      .orderBy("user_id", "event_type")
  }

  /** q77: ClickHouse `histogram(bins)(x)`
    * ([[graft.functions.AdaptiveHistogram]], Ben-Haim/Tom-Toub) per
    * return flag over l_quantity. The oracle leans on the algorithm's
    * exactness property — distinct values (50) under the bin budget
    * (64) make the adaptive histogram collapse to the exact frequency
    * table at ANY partitioning — so a plain GROUP-BY-value count pins
    * it. The over-budget approximate regime is spec-pinned
    * (AdaptiveHistogramSpec) by its order-invariant envelope. */
  def q77Histogram(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AdaptiveHistogram
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(AdaptiveHistogram.histogram(
        col("l_quantity").cast("double"), 64).as("h"))
      .select(col("l_returnflag"), explode(col("h")).as("e"))
      .select(col("l_returnflag"), col("e.x").as("q"), col("e.w").as("cnt"))
      .orderBy("l_returnflag", "q")
  }

  /** q78: ClickHouse moment/regression battery — `simpleLinearRegression
    * (hour, value)`, `corr`, `stddevSamp`, `skewPop`, `kurtPop` and the
    * `-If` combinators (`countIf`/`avgIf`) per event type. All
    * statistics are rational functions of the power sums (n, Σx, Σx²,
    * Σxy, Σy, Σy², Σy³, Σy⁴); the sums are accumulated EXACTLY (value
    * has 2 decimals, so its DECIMAL powers up to y³ are exact; y⁴ is
    * one deterministic IEEE product) and the double-precision formula
    * trees are written token-identically on both sides — so the oracle
    * comparison is bit-tight, with no dependence on either engine's
    * internal streaming-moment order. The sums are plain map-side
    * combinable aggregates: the shuffle carries 8 numbers per group,
    * the ClickHouse-aggregate scale shape. */
  def q78StatsBattery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = Tables(s, dir, "events")
    val h = hour(col("ts")).cast(DecimalType(18, 4))
    val v = col("value").cast(DecimalType(18, 4))
    val sums = e.groupBy(col("event_type")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(h).cast("double").as("sx"),
      sum(h * h).cast("double").as("sxx"),
      sum(h * v).cast("double").as("sxy"),
      sum(v).cast("double").as("sy"),
      sum(v * v).cast("double").as("syy"),
      sum((col("value") * col("value") * col("value"))
        .cast(DecimalType(38, 6))).cast("double").as("sy3"),
      sum(((col("value") * col("value")) * (col("value") * col("value")))
        .cast(DecimalType(38, 8))).cast("double").as("sy4"),
      count(when(col("value") > 100.0d, 1)).cast("double").as("nhi"),
      sum(when(col("value") > 100.0d, v)).cast("double").as("shi"))
    val n = col("n"); val sx = col("sx"); val sxx = col("sxx")
    val sxy = col("sxy"); val sy = col("sy"); val syy = col("syy")
    val sy3 = col("sy3"); val sy4 = col("sy4")
    // named intermediates mirror the oracle's `derived` CTE so both
    // engines evaluate token-identical double expression trees
    val derived = sums
      .withColumn("mu", sy / n)
      .withColumn("varp", syy / n - col("mu") * col("mu"))
      .withColumn("slope_raw",
        (n * sxy - sx * sy) / (n * sxx - sx * sx))
    val mu = col("mu"); val varp = col("varp"); val slope = col("slope_raw")
    derived.select(col("event_type"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / n, 6).as("intercept"),
      round((n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr"),
      round(sqrt((syy - sy * sy / n) / (n - lit(1.0d))), 6).as("stddev_samp"),
      round((sy3 / n - lit(3.0d) * mu * (syy / n) + lit(2.0d) * mu * mu * mu) /
        (sqrt(varp) * sqrt(varp) * sqrt(varp)), 6).as("skew_pop"),
      round((sy4 / n - lit(4.0d) * mu * (sy3 / n) +
        lit(6.0d) * mu * mu * (syy / n) - lit(3.0d) * mu * mu * mu * mu) /
        (varp * varp) - lit(3.0d), 6).as("kurt_pop"),
      col("nhi").cast("long").as("cnt_hi"),
      round(col("shi") / col("nhi"), 6).as("avg_hi"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_edit_dist_join" -> q75EditDistJoin _,
    "q76_sum_map" -> q76SumMap _,
    "q77_histogram" -> q77Histogram _,
    "q78_stats_battery" -> q78StatsBattery _)

  val oracles: Map[String, String] = Map(
    "q75_edit_dist_join" ->
      s"""WITH d AS (SELECT doc_id, substr(text, 1, $editHeadChars) AS head
        |           FROM documents WHERE n_chars >= $editHeadChars)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= $editDistMax
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q76_sum_map" ->
      """WITH wk AS (
        |  SELECT user_id, date_trunc('week', ts) AS wk, event_type,
        |    sum(CAST(value AS DECIMAL(18,4))) AS s
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT user_id, event_type,
        |  CAST(CAST(sum(s) AS DECIMAL(18,4)) AS DOUBLE) AS total,
        |  CAST(max(s) AS DOUBLE) AS weekly_max
        |FROM wk GROUP BY 1, 2
        |ORDER BY user_id, event_type""".stripMargin,
    "q77_histogram" ->
      """SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY l_returnflag, q""".stripMargin,
    "q78_stats_battery" ->
      """WITH sums AS (
        |  SELECT event_type,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(hour(ts) AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(hour(ts) AS DECIMAL(18,4)) *
        |             CAST(hour(ts) AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(hour(ts) AS DECIMAL(18,4)) *
        |             CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(value AS DECIMAL(18,4)) *
        |             CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(value * value * value AS DECIMAL(38,6)))
        |      AS DOUBLE) AS sy3,
        |    CAST(sum(CAST((value * value) * (value * value) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS sy4,
        |    CAST(count(CASE WHEN value > 100.0 THEN 1 END) AS DOUBLE) AS nhi,
        |    CAST(sum(CASE WHEN value > 100.0
        |             THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS shi
        |  FROM events GROUP BY event_type),
        |derived AS (
        |  SELECT *, sy / n AS mu,
        |    syy / n - (sy / n) * (sy / n) AS varp,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_raw
        |  FROM sums)
        |SELECT event_type,
        |  round(slope_raw, 6) AS slope,
        |  round((sy - slope_raw * sx) / n, 6) AS intercept,
        |  round((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr,
        |  round(sqrt((syy - sy * sy / n) / (n - 1.0)), 6) AS stddev_samp,
        |  round((sy3 / n - 3.0 * mu * (syy / n) + 2.0 * mu * mu * mu) /
        |    (sqrt(varp) * sqrt(varp) * sqrt(varp)), 6) AS skew_pop,
        |  round((sy4 / n - 4.0 * mu * (sy3 / n) + 6.0 * mu * mu * (syy / n)
        |    - 3.0 * mu * mu * mu * mu) / (varp * varp) - 3.0, 6) AS kurt_pop,
        |  CAST(nhi AS BIGINT) AS cnt_hi,
        |  round(shi / nhi, 6) AS avg_hi
        |FROM derived ORDER BY event_type""".stripMargin)
}
