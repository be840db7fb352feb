package graft

import org.apache.spark.sql.functions._

/** Sketch-based aggregates — the 100 TB alternatives to exact operators:
  * `approx_count_distinct` (HyperLogLog++, map-side mergeable, O(1)
  * memory per group) vs exact `countDistinct` (shuffle of the full
  * distinct key set). Pins the advertised error bound on real data so
  * the scale path is verifiably usable, not just available.
  */
class SketchSpec extends SparkSuite {

  test("approx_count_distinct stays within its rsd bound on events.user_id") {
    val events = Tables(spark, "/root/testdata/sf0.01", "events")
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    for (rsd <- Seq(0.05, 0.01)) {
      val approx = events
        .select(approx_count_distinct(col("user_id"), rsd)).head().getLong(0)
      val relErr = math.abs(approx - exact).toDouble / exact
      info(f"rsd=$rsd: exact=$exact approx=$approx relErr=$relErr%.4f")
      // 4σ of the configured relative standard deviation
      assert(relErr <= 4 * rsd, s"rsd=$rsd err=$relErr")
    }
  }

  test("low cardinality: HLL sparse mode is exact") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val exact = li.select(countDistinct(col("l_returnflag"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_returnflag"))).head().getLong(0)
    assert(approx === exact)
  }
}
