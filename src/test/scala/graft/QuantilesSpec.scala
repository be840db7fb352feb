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

  test("exactBucketed: value-identical to the sort form on edges and randoms") {
    import spark.implicits._
    // known edges (exact-index, interpolated, p=0/1, single value)
    val edges = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
      ("b", 7.0)).toDF("k", "v")
    val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 1.0 -> "p100")
    assert(Quantiles.exactBucketed(edges, "k", "v", ps, nBuckets = 8)
      .orderBy("k").collect().toSeq ===
      Quantiles.exact(edges, "k", "v", ps).orderBy("k").collect().toSeq)
    // randoms incl. ties, skew into one bin, and a tiny bucket count
    // (forces multi-rank buckets); parity must be exact row-for-row
    val rnd = new scala.util.Random(29)
    val rows = (1 to 4000).map { _ =>
      val k = "g" + rnd.nextInt(4)
      val v = if (rnd.nextBoolean()) rnd.nextInt(20).toDouble // heavy ties
              else math.pow(10, rnd.nextDouble() * 4) // skewed tail
      (k, v)
    } ++ Seq(("solo", 42.0)) // n = 1 group
    val df = rows.toDF("k", "v").repartition(16)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    for (nb <- Seq(4, 4096)) {
      assert(Quantiles.exactBucketed(df, "k", "v", qs, nBuckets = nb)
        .orderBy("k").collect().toSeq ===
        Quantiles.exact(df, "k", "v", qs).orderBy("k").collect().toSeq,
        s"nBuckets=$nb")
    }
    // all-equal values: every bin collapses to bucket 0
    val flat = Seq.fill(100)(("x", 5.0)).toDF("k", "v")
    assert(Quantiles.exactBucketed(flat, "k", "v", qs).collect().head
      .toSeq.drop(1) === Seq(5.0, 5.0, 5.0))
    // NaN values: exact() keeps them (NaN ranks last), so a NaN-carrying
    // group must NOT vanish from exactBucketed (pre-fix: max(__v)=NaN
    // poisoned the bucket arithmetic into NULL buckets and the equi-joins
    // dropped the whole group) — parity must hold on mixed-NaN,
    // all-NaN, and NaN-plus-single-real groups, with NaN-touching
    // quantiles coming out NaN on BOTH forms
    val nanV = Double.NaN
    val withNan = (Seq(("m", 1.0), ("m", 2.0), ("m", 3.0), ("m", nanV),
      ("alln", nanV), ("alln", nanV),
      ("one", 5.0), ("one", nanV)) ++
      (1 to 200).map(i => ("big", if (i % 50 == 0) nanV else i.toDouble)))
      .toDF("k", "v")
    for (nb <- Seq(4, 4096)) {
      val viaBN = Quantiles.exactBucketed(withNan, "k", "v", qs, nBuckets = nb)
        .orderBy("k").collect().toSeq.map(_.toSeq)
      val viaSN = Quantiles.exact(withNan, "k", "v", qs)
        .orderBy("k").collect().toSeq.map(_.toSeq)
      // NaN != NaN under ===, so compare with NaN-aware equality
      def eq(a: Any, b: Any): Boolean = (a, b) match {
        case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
        case _ => a == b
      }
      assert(viaBN.size === viaSN.size, s"nBuckets=$nb: group dropped")
      viaBN.zip(viaSN).foreach { case (rb, rs) =>
        assert(rb.zip(rs).forall { case (a, b) => eq(a, b) },
          s"nBuckets=$nb: $rb != $rs")
      }
      assert(viaBN.exists(_.head == "m"), s"nBuckets=$nb: NaN group vanished")
    }
    // NULL-key group survives (struct-wrapped join keys), like exact()
    val withNull = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0),
      (None, 30.0), (None, 50.0)).toDF("k", "v")
    val viaB = Quantiles.exactBucketed(withNull, "k", "v", qs)
      .collect().map(r => Option(r.getString(0)) -> r.toSeq.drop(1)).toMap
    val viaS = Quantiles.exact(withNull, "k", "v", qs)
      .collect().map(r => Option(r.getString(0)) -> r.toSeq.drop(1)).toMap
    assert(viaB === viaS)
    assert(viaB.contains(None) && viaB(None).head === 30.0)
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

  test("approx stays within 1% rank error of exact on real data") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = Quantiles.approxWithRankCheck(li, "l_returnflag", "l_extendedprice",
        Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"),
        accuracy = 10000, tol = 0.01)
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      (4 to 6).foreach { i =>
        assert(r.getBoolean(i),
          s"rank error > 1% for ${r.getString(0)} col $i: $r")
      }
    }
  }

  test("approx rank audit is tie-exact (two-sided CDF bracket)") {
    import spark.implicits._
    // heavy duplicates: the CDF jumps from 0 to ~0.99 at v=1.0 — a
    // single-point CDF check would call p50=1.0 wrong (CDF(1.0)=0.99 is
    // nowhere near 0.5); the [frac_lt, frac_le] bracket accepts it
    val df = (Seq.fill(990)(1.0) ++ Seq.fill(10)(2.0)).map(("k", _)).toDF("k", "v")
    val r = Quantiles.approxWithRankCheck(df, "k", "v",
        Seq(0.5 -> "p50"), accuracy = 10000, tol = 0.01)
      .collect().head
    assert(r.getDouble(1) === 1.0)
    assert(r.getBoolean(2), "p50=1.0 must pass the two-sided bracket under ties")
  }

  test("approx plan: partial sketch aggregation (map-side combine)") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = Quantiles.approx(li, "l_returnflag", "l_extendedprice",
        Seq(0.5 -> "p50"))
      .queryExecution.executedPlan.toString
    // the shuffle must carry constant-size sketch partials, not raw values
    assert(plan.contains("partial_percentile_approx"),
      s"approx quantiles must partial-aggregate sketches:\n$plan")
  }

  test("plan: no ObjectHashAggregate value buffering") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = Quantiles.exact(li, "l_returnflag", "l_extendedprice",
        Seq(0.5 -> "p50"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"quantiles must stay sort-based:\n$plan")
  }

  // --- exactWeighted --------------------------------------------------

  import spark.implicits._

  private def weighted(rows: Seq[(String, Double, Long)]) =
    Quantiles.exactWeighted(rows.toDF("k", "v", "w"), "k", "v", "w",
        Seq("p25" -> 1, "p50" -> 2, "p75" -> 3))
      .select("k", "p25", "p50", "p75", "total_weight")
      .as[(String, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("exactWeighted: weight-expansion equivalence on a hand case") {
    // expanding weights: 1×1, 2×3, 5×2, 9×4 → sorted multiset of 10 —
    // p25 at cumw≥2.5 → 2; median at ≥5 → 5 (cumw hits 4 then 6);
    // p75 at ≥7.5 → 9
    val got = weighted(Seq(("a", 1.0, 1L), ("a", 2.0, 3L), ("a", 5.0, 2L),
      ("a", 9.0, 4L)))
    val (_, p25, p50, p75, tot) = got("a")
    assert((p25, p50, p75, tot) === ((2.0, 5.0, 9.0, 10L)))
  }

  test("exactWeighted: all-equal weights reduce to unweighted lower quantile") {
    val got = weighted((1 to 8).map(i => ("a", i.toDouble, 1L)))
    val (_, p25, p50, p75, _) = got("a")
    // lower reading: smallest v with cum/8 ≥ q
    assert((p25, p50, p75) === ((2.0, 4.0, 6.0)))
  }

  test("tukeyOutliers: fences, census, and the no-outlier NULLs") {
    // 1..11 plus two planted outliers: q1=3.5, q3=9.5 (n=13 incl.
    // outliers shifts quartiles — use a hand-solved set instead)
    val rows = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0) ++ Seq(100.0, -50.0))
      .map(("k", _)).toDF("k", "v")
    // sorted: -50,1,2,3,4,5,6,7,100 (n=9): q1 at idx 2 → 2, q3 at idx 6 → 6
    // iqr 4 → fences -4 / 12 → outliers -50 and 100
    val got = Quantiles.tukeyOutliers(rows, "k", "v")
      .select("n", "q1", "q3", "lo_fence", "hi_fence", "n_outliers",
        "min_outlier", "max_outlier")
      .as[(Long, Double, Double, Double, Double, Long, Option[Double],
        Option[Double])].collect().head
    assert(got === ((9L, 2.0, 6.0, -4.0, 12.0, 2L, Some(-50.0),
      Some(100.0))))
    val clean = (1 to 8).map(i => ("k", i.toDouble)).toDF("k", "v")
    val none = Quantiles.tukeyOutliers(clean, "k", "v")
      .select("n_outliers", "min_outlier", "max_outlier")
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(none === ((0L, None, None)))
  }

  test("exactWeighted matches a weight-expanded sort model on random data") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 5).flatMap { g =>
      Seq.fill(30)((s"g$g", rnd.nextInt(100).toDouble,
        (1 + rnd.nextInt(9)).toLong))
    }
    val got = weighted(rows)
    for ((k, rs) <- rows.groupBy(_._1)) {
      val expanded = rs.flatMap { case (_, v, w) =>
        Seq.fill(w.toInt)(v) }.sorted
      val n = expanded.size
      def q(num: Int): Double =
        expanded(math.ceil(n.toDouble * num / 4).toInt - 1)
      val (_, p25, p50, p75, tot) = got(k)
      assert(tot === n.toLong)
      assert(p25 === q(1), s"$k p25")
      assert(p50 === q(2), s"$k p50")
      assert(p75 === q(3), s"$k p75")
    }
  }
}
