package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics: most-recent-prior match, simultaneous-row
  * visibility, no-prior-match null, and per-key isolation.
  */
class AsOfJoinSpec extends SparkSuite {

  test("picks latest right row at or before left time, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), // after r10, r20 → r20
      (2L, "u1", 20L),  // exactly at r20 → r20 (simultaneous visible)
      (3L, "u1", 5L),   // before all → null
      (4L, "u2", 50L))  // only u2's row, not u1's
      .toDF("lid", "k", "t")
    val right = Seq(
      (10L, "u1", 10L, 1.5),
      (20L, "u1", 20L, 2.5),
      (30L, "u2", 30L, 9.0),
      (40L, "u1", 999L, 0.0)) // future row never visible
      .toDF("rid", "k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t",
        leftCols = Seq("lid", "k"), rightCols = Seq("rid", "v"))
      .orderBy("lid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got === Array((1L, 20L), (2L, 20L), (3L, -1L), (4L, 30L)))
  }

  test("equal-time right rows resolve lexicographically by tieCols, last wins") {
    import spark.implicits._
    val left = Seq((1L, "u1", 10L)).toDF("lid", "k", "t")
    // three right rows at the same time; tie columns (pri, name) order
    // them (1,"a") < (2,"a") < (2,"z") — the LAST one must win. `name`
    // is a string: the old coalesce(cast long) collapse would have
    // nulled it; lexicographic ordering must keep it significant.
    val right = Seq(
      (100L, "u1", 10L, 2, "a"),
      (101L, "u1", 10L, 2, "z"),
      (102L, "u1", 10L, 1, "a"))
      .toDF("rid", "k", "t", "pri", "name")
    val got = AsOfJoin.asOf(left, right, "k", "t",
        leftCols = Seq("lid"), rightCols = Seq("rid"),
        tieCols = Seq("pri", "name"))
      .collect().map(_.getLong(1))
    assert(got === Array(101L))
  }

  test("plan: one shuffle by key, no row-amplifying join") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L)).toDF("lid", "k", "t")
    val right = Seq((2L, "a", 5L, 1.0)).toDF("rid", "k", "t", "v")
    val plan = AsOfJoin.asOf(left, right, "k", "t", Seq("lid"), Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), "carry-forward window missing")
  }
}
