package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewTools

/** Salted-join parity: the salt spread must never change the join
  * result, only the task distribution of hot keys.
  */
class SkewToolsSpec extends SparkSuite {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows hit one hot key
    val left = (1L to 1000L).map(i =>
      (i, if (i <= 900) "hot" else s"k${i % 7}")).toDF("lid", "k")
    val right = Seq(("hot", 10.0), ("k1", 1.0), ("k2", 2.0), ("kX", 99.0))
      .toDF("k", "v")
    val plain = left.join(right, Seq("k"))
      .select("k", "lid", "v").collect().map(_.toSeq).toSet
    val salted = SkewTools.saltedJoin(left, right, "k", col("lid"), nSalts = 8)
      .select("k", "lid", "v").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.count(_.head == "hot") === 900)
  }

  test("left-outer keeps unmatched left rows exactly once") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("lid", "k")
    val right = Seq(("b", 5.0)).toDF("k", "v")
    val got = SkewTools.saltedJoin(left, right, "k", col("lid"),
        nSalts = 4, joinType = "left")
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(got === Array((1L, -1.0), (2L, 5.0), (3L, 5.0)))
  }

  test("parity with plain join for every allowed join type") {
    import spark.implicits._
    val left = (1L to 200L).map(i =>
      (i, if (i <= 150) "hot" else s"k${i % 5}")).toDF("lid", "k")
    // includes a right key with no left match ("kX") and a left key with
    // no right match (k0..k4 partially) so semi/anti/outer paths differ
    val right = Seq(("hot", 10.0), ("k1", 1.0), ("kX", 99.0)).toDF("k", "v")
    for (jt <- Seq("inner", "left", "left_outer", "left_semi", "left_anti")) {
      val plainDf = left.join(right, Seq("k"), jt)
      val plain = plainDf.collect().map(_.toSeq).toSet
      val salted = SkewTools.saltedJoin(left, right, "k", col("lid"), 8, jt)
        .select(plainDf.columns.map(col): _*).collect().map(_.toSeq).toSet
      assert(salted === plain, s"parity broke for joinType=$jt")
    }
  }

  test("right/full outer joins are rejected (unmatched rows would be replicated)") {
    import spark.implicits._
    val left = Seq((1L, "a")).toDF("lid", "k")
    val right = Seq(("b", 5.0)).toDF("k", "v")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        SkewTools.saltedJoin(left, right, "k", col("lid"), 4, jt)
      }
      assert(e.getMessage.contains("inner/left"), s"wrong error for $jt")
    }
  }
}
