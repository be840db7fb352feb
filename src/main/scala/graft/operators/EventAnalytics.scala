package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ClickHouse-style event analytics (the workloads a sinker's users run
  * on the ingested tables: docs/dev/introduction.md:58-70 positions the
  * reference as the feeder of an OLAP event store). Batch forms of
  * sessionization, `windowFunnel` and `retention` — all expressed as
  * window functions / aggregates over ONE hash shuffle on the user key:
  * every window and the final per-user (or per-session) aggregate share
  * `partitionBy(userCol)`, so EnsureRequirements inserts a single
  * exchange and the window passes pipeline on top of it. At 100 TB the
  * shuffle carries only the projected analysis columns (user, time,
  * type, value), never the event payload.
  */
object EventAnalytics {

  private val WeekUs = 7L * 86400L * 1000000L

  /** Gap-based sessionization: a row starts a new session when it is
    * its user's first event or follows the previous one by more than
    * `gapUs`. Adds `session_seq` (1-based per user, ordered by time).
    * Tied timestamps are gap-0 by construction, so any tie order yields
    * the same assignment; the cumulative sum uses the default RANGE
    * frame (peers included) to stay order-independent — both mirrored
    * by the DuckDB oracle's default window frame. */
  def sessionize(
      events: DataFrame, userCol: String, tsCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val t = unix_micros(col(tsCol))
    val prev = lag(t, 1).over(w)
    events
      .withColumn("__new",
        when(prev.isNull || t - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(w))
      .drop("__new")
  }

  /** Strict-order funnel (ClickHouse `windowFunnel(window)(t, c1..cn)`
    * semantics in their exists-a-chain reading): per user, the maximum
    * k such that events matching `steps(0) < steps(1) < … < steps(k-1)`
    * exist at strictly increasing times with `t_k − t_1 ≤ windowUs`.
    *
    * Shape: k−1 chained cumulative-max window passes instead of a k-way
    * self-join. `__b1` is the latest step-1 time strictly before each
    * row; `__b(i)` the latest *chain start* reaching step i strictly
    * before each row (propagated unconstrained — the window bound binds
    * only at the level being scored, and a longer chain's constraint
    * implies its prefix's). Scoring at the max chain start is exact:
    * if the latest feasible start misses the window, every earlier one
    * misses it by more. Strictness comes from the RANGE(−∞, −1] frame
    * over integer microseconds, which excludes peer rows. All passes
    * share one partitioning; a duplicate step type scores its highest
    * level first (the `when` chain tests deepest-first). */
  def funnelLevels(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2, s"need >= 2 funnel steps, got ${steps.size}")
    val w = Window.partitionBy(userCol).orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, -1)
    var df = events.select(col(userCol), col(typeCol).as("__ty"),
      unix_micros(col(tsCol)).as("__t"))
    steps.indices.dropRight(1).foreach { i =>
      val chainStart =
        if (i == 0) when(col("__ty") === steps(0), col("__t"))
        else when(col("__ty") === steps(i), col(s"__b$i"))
      df = df.withColumn(s"__b${i + 1}", max(chainStart).over(w))
    }
    // foldLeft over ASCENDING indices so the DEEPEST level's condition
    // ends up outermost in the when-chain — with a duplicated step type
    // a row can satisfy several levels and must score the highest one
    val lvl = steps.indices.foldLeft(lit(0)) { (rest, i) =>
      val cond =
        if (i == 0) col("__ty") === steps(0)
        else col("__ty") === steps(i) && col(s"__b$i").isNotNull &&
          col("__t") - col(s"__b$i") <= windowUs
      when(cond, i + 1).otherwise(rest)
    }
    df.groupBy(col(userCol))
      .agg(max(lvl).cast("int").as("funnel_level"))
  }

  /** [[funnelLevels]] with ClickHouse's mode flags (`strict_dedup`,
    * `strict_order`, `strict_increase`) — evaluated per user by the
    * array-scan recurrence
    * ([[graft.functions.WindowFunnelExpr]]) over ONE collected
    * (t, step-mask) array, the [[SequenceMatch.collectSequences]]
    * shape: 16 bytes per matching event on the wire, "other" events
    * collected ONLY when `strictOrder` needs to see them (projected to
    * mask 0, still 16 bytes, payload never moves). With all flags off
    * and distinct timestamps this equals [[funnelLevels]] — the spec
    * cross-validates the two implementations. */
  def funnelLevelsModes(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long,
      strictDedup: Boolean = false, strictOrder: Boolean = false,
      strictIncrease: Boolean = false): DataFrame = {
    require(steps.size >= 2, s"need >= 2 funnel steps, got ${steps.size}")
    val mask = steps.zipWithIndex
      .map { case (s, i) => when(col(typeCol) === s, lit(1L << i)).otherwise(0L) }
      .reduce(_.bitwiseOR(_))
    val base = events.select(col(userCol),
      unix_micros(col(tsCol)).as("__t"), mask.as("__mask"))
    val kept = if (strictOrder) base else base.filter(col("__mask") =!= 0L)
    import graft.functions.{ColumnBridge, WindowFunnelExpr}
    kept.groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("__t"), col("__mask"))))
        .as("__ev"))
      .select(col(userCol), ColumnBridge.col(WindowFunnelExpr(
        ColumnBridge.expr(col("__ev")), windowUs, steps.size,
        strictDedup, strictOrder, strictIncrease)).as("funnel_level"))
  }

  /** ClickHouse `retention(cond1, …, condN)` in its LITERAL aggregate
    * form (the cohort matrix generalization is [[cohortRetention]]):
    * per key, flag r_i = (cond_1 held) AND (cond_i held); the query
    * layer then sums each slot across keys — exactly how CH users
    * consume it (`sum(r[1]) / sum(r[0])`). Output: one row —
    * (n_keys, r_0, r_1, …) with r_i the count of keys where both the
    * anchor and condition i held.
    *
    * Shape: one key-hash combinable aggregate (a bitmask per key), then
    * a single global sum of ≤N counters — nothing wider than N longs
    * ever crosses the second exchange. */
  def retentionConditions(
      events: DataFrame, keyCol: String, conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty && conds.size <= 32,
      s"1..32 retention conditions, got ${conds.size}")
    val flags = events.groupBy(col(keyCol)).agg(
      max(when(conds.head, 1L).otherwise(0L)).as("__c0"),
      conds.tail.zipWithIndex.map { case (c, i) =>
        max(when(c, 1L).otherwise(0L)).as(s"__c${i + 1}")
      }: _*)
    val outs = count(lit(1)).as("n_keys") +:
      conds.indices.map { i =>
        sum(when(col("__c0") === 1L && col(s"__c$i") === 1L, 1L)
          .otherwise(0L)).as(s"r_$i")
      }
    flags.agg(outs.head, outs.tail: _*)
  }

  /** Cohort retention matrix (ClickHouse `retention` generalized to a
    * cohort table): cohort = ISO week of each user's first `cohortType`
    * event; a user is retained at offset o if active (ANY event) in
    * cohort-week + o. Emits (cohort, week_offset, n_active,
    * cohort_size, retention). The per-USER cohort table is
    * user-cardinality — joined on the user key WITHOUT a broadcast hint
    * (both sides are user-keyed shuffles; AQE still broadcasts it when
    * a deployment's user set is genuinely small). Only the per-WEEK
    * `sizes` aggregate — cohort-week cardinality — is hinted broadcast. */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      cohortType: String): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(date_trunc("week", col(tsCol))).as("__cohort"))
    val sizes = cohorts.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__wk"))
      .distinct()
    active
      .join(cohorts, userCol)
      .filter(col("__wk") >= col("__cohort"))
      .select(col("__cohort"),
        // +half-week before the truncating divide = round-to-nearest:
        // exact in UTC (boundaries are whole weeks apart) and correct in
        // a DST session zone, where spring-forward makes adjacent week
        // boundaries 7d−1h apart and a bare floor would collapse
        // offset 1 into offset 0
        ((unix_micros(col("__wk")) - unix_micros(col("__cohort")) +
          lit(WeekUs / 2)) / lit(WeekUs)).cast("long").as("week_offset"),
        col(userCol))
      .groupBy(col("__cohort"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
      .join(broadcast(sizes), "__cohort")
      .select(col("__cohort").as("cohort"), col("week_offset"),
        col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** DECIMAL-routed double sum (partition-order independent; mirrors the
    * oracle's `CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE)`). */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** ClickHouse `deltaSum(v)` — the counter-rate aggregate: sums the
    * differences between consecutive values, IGNORING negative deltas
    * (a counter reset contributes 0, not a huge negative swing). CH
    * evaluates in insertion order; the well-defined batch equivalent
    * orders by (`timeCol`, `tieCol`) within `keyCol`, which is what CH
    * users get from `ORDER BY` tuples in a MergeTree anyway. One row
    * per key: (key, delta_sum). CH aggregate-function conventions both
    * honored: NULL inputs are SKIPPED (the delta chain bridges across a
    * null value via ignoreNulls lag, it does not break), and a
    * non-empty group with no positive delta — single-event, constant,
    * or strictly decreasing counters — yields 0, not NULL.
    *
    * Scale shape: the lag window and the final aggregate share one
    * key-hash partitioning → a single shuffle, per-key-bounded sort.
    * Deltas are DECIMAL(18,4) so the sum is exact and order-free. */
  def deltaSum(
      events: DataFrame, keyCol: String, timeCol: String, tieCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
    val v = col(valCol).cast(DecimalType(18, 4))
    // previous NON-NULL value: a null row contributes no delta and the
    // chain continues around it (CH aggregates skip NULLs)
    val d = v - lag(v, 1, null, ignoreNulls = true).over(w)
    events
      .withColumn("__d", when(d > 0, d))
      .groupBy(col(keyCol))
      .agg(coalesce(sum(col("__d")), lit(0)).cast("double").as("delta_sum"))
  }

  /** ClickHouse `groupArrayMovingSum(n)` / `groupArrayMovingAvg(n)`
    * (docs: "moving sum/average of input values over a window of size
    * n"), flattened from CH's array-per-group form to the equivalent
    * one-row-per-event stream: for each event in (`timeCol`, `tieCol`)
    * order within `keyCol`, the sum/avg of the last `n` values
    * INCLUDING the current one. CH head-frame semantics: the sum covers
    * only the values seen so far, but the avg STILL divides by the full
    * window size n (docs example: `groupArrayMovingAvg(2)` over
    * [1,2,4,7] → first element 1/2, not 1/1). Appends `mv_sum`,
    * `mv_avg`, and `mv_n` (the filled frame count, so a filled-frame
    * mean is one division away when that is what's wanted).
    *
    * Scale shape: one key-hash shuffle; the window sort is per-key and
    * bounded by that key's event count (the same property as
    * [[sessionize]] — at 100 TB the sort never sees more than one
    * user's history). The sum is routed through DECIMAL(18,4) so the
    * moving value is exact and independent of how the engine evaluates
    * the frame (Spark re-scans the sliding frame; DuckDB merges segment
    * trees — associative only because the addition is exact). */
  def movingAgg(
      events: DataFrame, keyCol: String, timeCol: String, tieCol: String,
      valCol: String, n: Int): DataFrame = {
    require(n > 0, s"window size must be positive, got $n")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(-(n - 1), Window.currentRow)
    val mvSum = sum(col(valCol).cast(DecimalType(18, 4))).over(w)
      .cast("double")
    val mvN = count(lit(1)).over(w)
    events
      .withColumn("mv_sum", mvSum)
      .withColumn("mv_n", mvN)
      .withColumn("mv_avg", round(col("mv_sum") / lit(n), 6))
  }

  /** ClickHouse `exponentialTimeDecayedAvg(halflife)(v, t)` evaluated
    * at each key's LAST event — the "current smoothed value" reading a
    * monitoring pipeline wants: every observation weighted by
    * 2^(−Δt/halflife) against the key's latest timestamp, then the
    * weighted mean. One row per key: (key, n_events, ema).
    *
    * The closed form Σ v·w / Σ w (w = 2^(−(t_last−t)/h)) needs no
    * sequential scan — unlike the stateful recurrence it is
    * order-free, so it distributes as a plain aggregate. The window
    * max and the two sums share ONE key-hash exchange. Each weighted
    * term is rounded into DECIMAL(28,12) before summation so both the
    * sum and the quotient are bit-deterministic under any partitioning
    * (the dsum discipline; a raw double Σ would be order-dependent).
    *
    * `halflifeUs` is in microseconds of `timeCol` (epoch-µs both here
    * and in the oracle). */
  def timeDecayedAvg(
      events: DataFrame, keyCol: String, timeCol: String, valCol: String,
      halflifeUs: Long): DataFrame = {
    require(halflifeUs > 0, s"halflife must be positive, got $halflifeUs")
    val w = Window.partitionBy(col(keyCol))
    val t = unix_micros(col(timeCol))
    val tLast = max(t).over(w)
    // pow of a double exponent is identical IEEE on both engines; the
    // order-sensitive step is the SUM, which the decimal cast removes
    // (cast, not round: CAST decimalizes the exact binary expansion on
    // both engines — the q50 discipline)
    val wt = pow(lit(0.5d),
      (tLast - t).cast("double") / lit(halflifeUs.toDouble))
    events
      // CH aggregates skip NULL values; without the filter a NULL row
      // would still contribute its weight to the denominator (and be
      // counted), biasing the mean low
      .filter(col(valCol).isNotNull)
      .withColumn("__w", wt.cast(DecimalType(28, 12)))
      .withColumn("__wv", (wt * col(valCol)).cast(DecimalType(28, 12)))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("__wv")).cast("double") /
          sum(col("__w")).cast("double"), 6).as("ema"))
  }

  /** ClickHouse `sequenceNextNode(direction, base)(t, node, conds…)`:
    * per key, find where the chain `steps(0), steps(1), …` matches
    * consecutively in scan order and return the node value immediately
    * after the matched chain in that same scan order (NULL when the
    * chain ends the sequence; no output row when it never matches).
    * Output one row per key: (key, next_node).
    *
    *  - `direction = "forward"`: scan ascending (t, tie); "next" is
    *    later in time. `direction = "backward"`: scan descending;
    *    the chain is matched from the future toward the past and
    *    "next" is EARLIER in time.
    *  - `base = "head"`: the chain must start at the scan's first
    *    event (ClickHouse `head` forward / `tail` backward — pass
    *    "head" for both; it means scan-start). `base = "first_match"`
    *    / `"last_match"`: the first / last chain occurrence in scan
    *    order.
    *
    * Shape: `steps.size` lead() columns over one key-hash window — the
    * chain test is a row-local conjunction, no self-join, no state
    * beyond the per-key sort. */
  def sequenceNextNode(
      events: DataFrame, keyCol: String, timeCol: String, tieCol: String,
      nodeCol: String, steps: Seq[String],
      direction: String = "forward",
      base: String = "first_match"): DataFrame = {
    require(steps.nonEmpty, "sequenceNextNode needs at least one step")
    require(Seq("forward", "backward").contains(direction),
      s"direction must be forward|backward, got $direction")
    require(Seq("head", "first_match", "last_match").contains(base),
      s"base must be head|first_match|last_match, got $base")
    val w =
      if (direction == "forward")
        Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
      else
        Window.partitionBy(col(keyCol))
          .orderBy(col(timeCol).desc, col(tieCol).desc)
    val matched = steps.zipWithIndex.map { case (s, i) =>
      (if (i == 0) col(nodeCol) else lead(col(nodeCol), i).over(w)) === lit(s)
    }.reduce(_ && _)
    val nxt = lead(col(nodeCol), steps.size).over(w)
    val ranked = events
      .withColumn("__m", matched)
      .withColumn("__nxt", nxt)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__m"))
    base match {
      case "head" =>
        ranked.filter(col("__rn") === 1)
          .select(col(keyCol), col("__nxt").as("next_node"))
      case "first_match" =>
        // struct-min, not min_by: the carried value may be NULL (chain
        // at the scan's end) and must survive as NULL; __rn is unique
        // so __nxt never participates in the comparison
        ranked.groupBy(col(keyCol))
          .agg(min(struct(col("__rn"), col("__nxt")))
            .getField("__nxt").as("next_node"))
      case "last_match" =>
        ranked.groupBy(col(keyCol))
          .agg(max(struct(col("__rn"), col("__nxt")))
            .getField("__nxt").as("next_node"))
    }
  }
}
