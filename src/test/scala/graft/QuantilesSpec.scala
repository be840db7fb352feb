package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** Sort-based exact quantiles: percentile_cont interpolation parity
  * (including exact-index, interpolated, p=0 and p=1 edges) and plan
  * shape (no value-buffering ObjectHashAggregate).
  */
class QuantilesSpec extends SparkSuite {

  test("interpolation matches percentile_cont on known values") {
    import spark.implicits._
    // values 10,20,30,40 → p50 = 25 (interp), p0 = 10, p1 = 40,
    // p25 = 17.5, and a single-value group where every p = 7
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
      ("b", 7.0)).toDF("k", "v")
    val got = Quantiles.exact(df, "k", "v",
        Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 1.0 -> "p100"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got === Array(
      ("a", 10.0, 17.5, 25.0, 40.0),
      ("b", 7.0, 7.0, 7.0, 7.0)))
  }

  test("agrees with Spark's exact percentile on real data") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val mine = Quantiles.exact(li, "l_returnflag", "l_extendedprice",
        Seq(0.5 -> "p50", 0.99 -> "p99"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val ref = li.groupBy("l_returnflag")
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(mine === ref)
  }

  test("plan: no ObjectHashAggregate value buffering") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = Quantiles.exact(li, "l_returnflag", "l_extendedprice",
        Seq(0.5 -> "p50"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"quantiles must stay sort-based:\n$plan")
  }
}
