package graft

import org.apache.spark.sql.functions._

import graft.operators.CategoricalStats

class CategoricalStatsSpec extends SparkSuite {
  import spark.implicits._

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("entropy: uniform k categories → log2 k; single category → 0") {
    val df = Seq(
      ("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"),
      ("s", "only"), ("s", "only"), ("s", "only"))
      .toDF("k", "v")
    val got = CategoricalStats.entropy(df, "k", "v")
      .select("k", "n", "entropy").as[(String, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // ClickHouse entropy is in bits: uniform over 4 → exactly 2 bits
    assert(got("u") === ((4L, 2.0)))
    assert(got("s") === ((3L, 0.0)))
  }

  test("entropy matches -Σ p ln p on a skewed mix") {
    val df = (Seq.fill(8)("x") ++ Seq.fill(2)("y") ++ Seq.fill(10)("z"))
      .map(("k", _)).toDF("k", "v")
    val want = Seq(8, 2, 10).map { c =>
      val p = c / 20.0; -p * (math.log(p) / math.log(2.0))
    }.sum
    val got = CategoricalStats.entropy(df, "k", "v")
      .select("entropy").as[Double].collect().head
    assert(math.abs(got - want) < 1e-6)
  }

  test("association: perfect dependence → V = 1, U = 1") {
    // y is a function of x (and vice versa): a↔p, b↔q
    val df = (Seq.fill(6)(("a", "p")) ++ Seq.fill(4)(("b", "q")))
      .toDF("x", "y")
    val got = CategoricalStats.association(df, "x", "y")
      .select("n", "n_x", "n_y", "cramers_v", "theils_u")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got._1 === 10L); assert(got._2 === 2L); assert(got._3 === 2L)
    assert(got._4 === 1.0)
    assert(got._5 === 1.0)
  }

  test("association: exact independence → chi2 = 0, V = 0, U = 0") {
    // counts factor exactly: cell(x,y) = rowShare(x) * colShare(y) * n
    val df = (
      Seq.fill(6)(("a", "p")) ++ Seq.fill(2)(("a", "q")) ++
        Seq.fill(3)(("b", "p")) ++ Seq.fill(1)(("b", "q")))
      .toDF("x", "y")
    val got = CategoricalStats.association(df, "x", "y")
      .select("chi2", "cramers_v", "theils_u")
      .as[(Double, Double, Double)].collect().head
    assert(got._1 === 0.0)
    assert(got._2 === 0.0)
    assert(got._3 === 0.0)
  }

  test("informationValue: WoE table matches the direct formula") {
    // a: 6 good / 2 bad; b: 2 good / 6 bad → G = B = 8
    val df = (
      Seq.fill(6)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
        Seq.fill(2)(("b", true)) ++ Seq.fill(6)(("b", false)))
      .toDF("x", "y")
    val got = CategoricalStats.informationValue(df, "x", col("y"))
      .select("x", "n_good", "n_bad", "woe", "iv_term")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val woeA = math.log((6.0 * 8.0) / (2.0 * 8.0))
    assert(got("a")._2 === 6L); assert(got("a")._3 === 2L)
    assert(math.abs(got("a")._4.get - r6(woeA)) < 1e-9)
    assert(math.abs(got("a")._5.get - r6((6.0 / 8 - 2.0 / 8) * woeA)) < 1e-6)
    // symmetry: b's WoE is −a's, iv terms equal
    assert(got("b")._4.get === -got("a")._4.get)
    assert(got("b")._5.get === got("a")._5.get)
  }

  test("informationValue: single-class categories yield NULL, not ±Inf") {
    val df = (Seq.fill(3)(("pure", true)) ++ Seq.fill(2)(("mix", true)) ++
      Seq.fill(2)(("mix", false))).toDF("x", "y")
    val got = CategoricalStats.informationValue(df, "x", col("y"))
      .select("x", "woe").as[(String, Option[Double])].collect().toMap
    assert(got("pure") === None)
    assert(got("mix").isDefined)
  }

  test("association: chi2 matches the direct formula on a 3×2 table") {
    val cells = Map(
      ("a", "p") -> 5, ("a", "q") -> 1,
      ("b", "p") -> 2, ("b", "q") -> 6,
      ("c", "p") -> 3, ("c", "q") -> 3)
    val df = cells.toSeq.flatMap { case ((x, y), c) =>
      Seq.fill(c)((x, y)) }.toDF("x", "y")
    val n = cells.values.sum.toDouble
    val rows = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cols = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val chi2 = cells.map { case ((x, y), o) =>
      val e = rows(x) * cols(y) / n
      (o - e) * (o - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * math.min(rows.size - 1, cols.size - 1)))
    val got = CategoricalStats.association(df, "x", "y")
      .select("chi2", "cramers_v").as[(Double, Double)].collect().head
    assert(math.abs(got._1 - chi2) < 1e-6)
    assert(math.abs(got._2 - v) < 1e-6)
  }
}
