package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.MapCombine

/** sumMap/minMap/maxMap: pinned against groupBy-per-key brute force,
  * with forced multi-partition partial merges (serialization path) and
  * the ClickHouse sorted-keys output contract. */
class MapCombineSpec extends SparkSuite {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  private def input = {
    import spark.implicits._
    Seq(
      (1L, Seq("a", "b"), Seq(BigDecimal("1.5"), BigDecimal("2.0"))),
      (1L, Seq("b", "c"), Seq(BigDecimal("3.25"), BigDecimal("-1.0"))),
      (1L, Seq("a"), Seq(BigDecimal("0.0001"))),
      (2L, Seq("z"), Seq(BigDecimal("7.0"))),
      (2L, Seq.empty[String], Seq.empty[BigDecimal]))
      .toDF("g", "ks", "vs")
      .select(col("g"), col("ks"),
        transform(col("vs"), v => dec(v)).as("vs"))
      .repartition(4) // force partial buffers + serialize/merge
  }

  test("sumMap: per-key exact sums, sorted keys") {
    import spark.implicits._
    val out = input.groupBy("g")
      .agg(MapCombine.sumMap(col("ks"), col("vs")).as("m"))
      .select(col("g"), map_keys(col("m")).as("ks"),
        transform(map_values(col("m")), _.cast("string")).as("vs"))
      .as[(Long, Seq[String], Seq[String])].collect()
      .map { case (g, ks, vs) => g -> ks.zip(vs) }.toMap
    assert(out(1L) === Seq("a" -> "1.5001", "b" -> "5.2500", "c" -> "-1.0000")
      .map { case (k, v) => (k, v) })
    assert(out(2L) === Seq("z" -> "7.0000"))
  }

  test("minMap / maxMap") {
    import spark.implicits._
    val rows = input.groupBy("g")
      .agg(MapCombine.minMap(col("ks"), col("vs")).as("lo"),
        MapCombine.maxMap(col("ks"), col("vs")).as("hi"))
      .select(col("g"),
        element_at(col("lo"), "b").cast("string").as("blo"),
        element_at(col("hi"), "b").cast("string").as("bhi"))
      .as[(Long, String, String)].collect()
      .map { case (g, lo, hi) => g -> ((lo, hi)) }.toMap
    assert(rows(1L) === (("2.0000", "3.2500")))
  }

  test("two-level merge (State/Merge shape) equals single-level") {
    val lvl1 = input.withColumn("half", pmod(crc32(col("ks").cast("string")), lit(2)))
      .groupBy("g", "half")
      .agg(MapCombine.sumMap(col("ks"), col("vs")).as("m"))
    val merged = lvl1.groupBy("g")
      .agg(MapCombine.sumMap(map_keys(col("m")), map_values(col("m"))).as("m"))
      .select(col("g"), to_json(col("m")).as("j"))
    val direct = input.groupBy("g")
      .agg(MapCombine.sumMap(col("ks"), col("vs")).as("m"))
      .select(col("g"), to_json(col("m")).as("j"))
    assert(merged.collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq ===
      direct.collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq)
  }

  test("mismatched key/value array sizes fail loudly") {
    import spark.implicits._
    val bad = Seq((1L, Seq("a", "b"), Seq(BigDecimal("1.0"))))
      .toDF("g", "ks", "vs")
      .select(col("g"), col("ks"), transform(col("vs"), v => dec(v)).as("vs"))
    val e = intercept[Exception] {
      bad.groupBy("g").agg(MapCombine.sumMap(col("ks"), col("vs"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("null keys/values are skipped, null arrays contribute nothing") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[String]("a", null), Seq[Option[BigDecimal]](Some(BigDecimal("1.0")), Some(BigDecimal("2.0")))),
      (1L, Seq[String]("b"), Seq[Option[BigDecimal]](None)),
      (1L, null.asInstanceOf[Seq[String]], null.asInstanceOf[Seq[Option[BigDecimal]]]))
      .toDF("g", "ks", "vs")
      .select(col("g"), col("ks"), transform(col("vs"), v => dec(v)).as("vs"))
    val out = rows.groupBy("g")
      .agg(MapCombine.sumMap(col("ks"), col("vs")).as("m"))
      .select(to_json(col("m"))).collect().head.getString(0)
    assert(out === """{"a":1.0000}""")
  }

  test("sums past DECIMAL(18,4) survive the shuffle (wide accumulation)") {
    import spark.implicits._
    // 40 rows near the 18,4 max: the per-key sum (~4×10^15) overflows
    // the input type and the old unscaled-long serialization; the wide
    // path must carry it exactly through partial serialization + merge
    val rows = Seq.tabulate(40)(i =>
      (i.toLong, Seq("k"), Seq(BigDecimal("99999999999999.9999"))))
      .toDF("g", "ks", "vs")
      .select(lit(1L).as("g"), col("ks"),
        transform(col("vs"), v => dec(v)).as("vs"))
      .repartition(8) // force real partial buffers + merges
    val out = rows.groupBy("g")
      .agg(MapCombine.sumMap(col("ks"), col("vs")).as("m"))
      .select(element_at(col("m"), "k").cast("string"))
      .collect().head.getString(0)
    assert(out === "3999999999999999.9960")
  }
}
