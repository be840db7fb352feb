package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.EventAnalytics

/** ClickHouse-analytics exercises over the `events` stream table
  * ([[graft.operators.EventAnalytics]]): the sessionize / windowFunnel /
  * retention workloads the reference's ingested tables exist to serve.
  * All three run on one user-keyed shuffle; the oracles re-derive the
  * same semantics in DuckDB window SQL over exact integer microseconds
  * (`epoch_us` both sides — the test data is micro-precise, so the
  * ns→µs conversion in [[graft.Tables]] is lossless). */
object EventQueries {

  /** 8 h inactivity gap: sparse synthetic traffic (~2.2 events/user/day)
    * still yields multi-event sessions at this gap. */
  private val SessionGapUs = 8L * 3600L * 1000000L

  /** 24 h chain window: measured level distribution at sf0.01 is
    * 1/65/66/18 across levels 1-4 — every level populated, so the gate
    * discriminates all four scoring branches. */
  private val FunnelWindowUs = 24L * 3600L * 1000000L

  private val FunnelSteps = Seq("signup", "view", "click", "purchase")

  /** q54: gap sessionization + per-session rollup. One shuffle: the
    * window passes and the (user, session) aggregate share the user
    * hash partitioning. */
  def q54Sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "events")
    EventAnalytics.sessionize(e, "user_id", "ts", SessionGapUs)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        EventAnalytics.dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  /** q55: strict-order funnel signup→view→click→purchase within 24 h
    * (ClickHouse windowFunnel). Chained cumulative-max windows — no
    * self-join; the spec pins the operator against a brute-force
    * exists-chain model on adversarial corpora. */
  def q55Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "events")
    EventAnalytics.funnelLevels(e, "user_id", "ts", "event_type",
        FunnelSteps, FunnelWindowUs)
      .orderBy("user_id")
  }

  /** q56: weekly cohort retention — cohort by first `signup` week,
    * retained = any activity at week offset o. */
  def q56Retention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "events")
    EventAnalytics.cohortRetention(e, "user_id", "ts", "event_type",
        cohortType = "signup")
      .orderBy("cohort", "week_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_sessionize" -> q54Sessionize _,
    "q55_funnel" -> q55Funnel _,
    "q56_retention" -> q56Retention _)

  val oracles: Map[String, String] = Map(
    "q54_sessionize" ->
      s"""WITH e AS (SELECT user_id, ts, epoch_us(ts) AS t, value FROM events),
        |g AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |         OR t - lag(t) OVER w > $SessionGapUs THEN 1 ELSE 0 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (SELECT *, CAST(sum(nw) OVER
        |        (PARTITION BY user_id ORDER BY t) AS BIGINT) AS session_seq
        |      FROM g)
        |SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q55_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
        |s1 AS (SELECT *, max(CASE WHEN event_type = 'signup' THEN t END)
        |         OVER w AS b1 FROM e
        |       WINDOW w AS (PARTITION BY user_id ORDER BY t
        |         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s2 AS (SELECT *, max(CASE WHEN event_type = 'view' THEN b1 END)
        |         OVER w AS b2 FROM s1
        |       WINDOW w AS (PARTITION BY user_id ORDER BY t
        |         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s3 AS (SELECT *, max(CASE WHEN event_type = 'click' THEN b2 END)
        |         OVER w AS b3 FROM s2
        |       WINDOW w AS (PARTITION BY user_id ORDER BY t
        |         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, CAST(max(CASE
        |    WHEN event_type = 'purchase' AND b3 IS NOT NULL
        |      AND t - b3 <= $FunnelWindowUs THEN 4
        |    WHEN event_type = 'click' AND b2 IS NOT NULL
        |      AND t - b2 <= $FunnelWindowUs THEN 3
        |    WHEN event_type = 'view' AND b1 IS NOT NULL
        |      AND t - b1 <= $FunnelWindowUs THEN 2
        |    WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS INTEGER)
        |  AS funnel_level
        |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q56_retention" ->
      """WITH su AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
        |            FROM events WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |        FROM events),
        |j AS (SELECT s.cohort,
        |        (epoch_us(a.wk) - epoch_us(s.cohort) + 302400000000)
        |          // 604800000000 AS week_offset,
        |        a.user_id
        |      FROM act a JOIN su s USING (user_id)
        |      WHERE a.wk >= s.cohort),
        |r AS (SELECT cohort, CAST(week_offset AS BIGINT) AS week_offset,
        |        CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |      FROM j GROUP BY 1, 2),
        |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM su GROUP BY 1)
        |SELECT r.cohort, r.week_offset, r.n_active, cs.cohort_size,
        |  round(CAST(r.n_active AS DOUBLE) / cs.cohort_size, 6) AS retention
        |FROM r JOIN cs USING (cohort)
        |ORDER BY cohort, week_offset""".stripMargin)
}
