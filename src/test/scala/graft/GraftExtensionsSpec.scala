package graft

import org.apache.spark.sql.functions._

/** [[graft.GraftExtensions]] — every injected SQL name resolves and
  * returns the same result as the spec-pinned implementation it wraps
  * (the extension adds NAMES, not code paths, so these are parity and
  * argument-contract checks, not re-derivations). The shared
  * SparkSuite session is built with
  * `spark.sql.extensions=graft.GraftExtensions`, i.e. the production
  * wiring, not a test-only registry. */
class GraftExtensionsSpec extends SparkSuite {
  import spark.implicits._

  private def sql1[T](q: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    spark.sql(q).as[T].collect().head

  test("graft_xxhash64 is seed-0 (ClickHouse parity), not Spark's 42") {
    Seq(("abc")).toDF("s").createOrReplaceTempView("t_hash")
    val viaSql = sql1[Long]("SELECT graft_xxhash64(s) FROM t_hash")
    val viaCol = Seq("abc").toDF("s")
      .select(graft.functions.Hashes.xxhash64Seed0(col("s")))
      .as[Long].collect().head
    val spark42 = sql1[Long]("SELECT xxhash64(s) FROM t_hash")
    assert(viaSql === viaCol)
    assert(viaSql !== spark42)
  }

  test("graft_uniq_upto: exact below cap, pinned at n+1 above") {
    (1L to 10L).toDF("x").createOrReplaceTempView("t_uniq")
    assert(sql1[Long]("SELECT graft_uniq_upto(x, 20) FROM t_uniq") === 10L)
    assert(sql1[Long]("SELECT graft_uniq_upto(x, 4) FROM t_uniq") === 5L)
  }

  test("graft_bitmap_distinct + graft_bitmap_state round-trip") {
    Seq(1L, 2L, 2L, 3L, 1L << 40).toDF("x")
      .createOrReplaceTempView("t_bm")
    assert(sql1[Long]("SELECT graft_bitmap_distinct(x) FROM t_bm") === 4L)
    val state = sql1[Array[Byte]]("SELECT graft_bitmap_state(x) FROM t_bm")
    assert(graft.functions.Roaring64.deserialize(state).cardinality === 4L)
  }

  test("graft_topk: exact mode under capacity, (est desc, term) order") {
    Seq("a", "b", "b", "c", "b", "a").toDF("s")
      .createOrReplaceTempView("t_topk")
    val rows = spark.sql(
      "SELECT inline(graft_topk(s, 8)) FROM t_topk")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows === Seq(("b", 3L, 0L), ("a", 2L, 0L), ("c", 1L, 0L)))
  }

  test("graft_tdigest: literal percentile, sane value on uniform data") {
    (1 to 1001).map(_.toDouble).toDF("x").createOrReplaceTempView("t_td")
    val Array(p50) =
      sql1[Array[Double]]("SELECT graft_tdigest(x, 0.5) FROM t_td")
    assert(math.abs(p50 - 501.0) < 15.0)
  }

  test("graft_normalize and graft_winnow match their Column forms") {
    val s = "Á  b\u0000c" // decomposed accent, double space, control
    Seq(s).toDF("s").createOrReplaceTempView("t_norm")
    import graft.functions.ColumnBridge
    val viaSql = sql1[String]("SELECT graft_normalize(s) FROM t_norm")
    val viaCol = Seq(s).toDF("s")
      .select(ColumnBridge.col(
        graft.functions.NormalizeText(ColumnBridge.expr(col("s")))))
      .as[String].collect().head
    assert(viaSql === viaCol)

    Seq("the quick brown fox jumps over the lazy dog").toDF("s")
      .createOrReplaceTempView("t_win")
    val sqlFps = spark.sql("SELECT graft_winnow(s, 5, 4) FROM t_win")
      .as[Seq[Long]].collect().head
    val colFps = Seq("the quick brown fox jumps over the lazy dog").toDF("s")
      .select(ColumnBridge.col(graft.functions.WinnowFingerprints(
        ColumnBridge.expr(col("s")), 5, 4)))
      .as[Seq[Long]].collect().head
    assert(sqlFps === colFps)
  }

  test("graft_sum_map matches MapCombine.sumMap") {
    val df = Seq(
      (1L, Seq("a", "b"), Seq(BigDecimal("1.5"), BigDecimal("2.0"))),
      (1L, Seq("b", "c"), Seq(BigDecimal("0.5"), BigDecimal("3.0"))))
      .toDF("g", "ks", "vs")
      .select(col("g"), col("ks"),
        col("vs").cast("array<decimal(18,4)>").as("vs"))
    df.createOrReplaceTempView("t_sm")
    val viaSql = spark.sql(
      "SELECT graft_sum_map(ks, vs) FROM t_sm GROUP BY g")
      .collect().head.getMap[String, java.math.BigDecimal](0)
    val viaCol = df.groupBy("g")
      .agg(graft.functions.MapCombine.sumMap(col("ks"), col("vs")))
      .collect().head.getMap[String, java.math.BigDecimal](1)
    assert(viaSql === viaCol)
    assert(viaSql.view.mapValues(_.toString).toMap ===
      Map("a" -> "1.5000", "b" -> "2.5000", "c" -> "3.0000"))
  }

  test("graft_histogram matches AdaptiveHistogram under capacity") {
    Seq(1.0, 2.0, 2.0, 9.0).toDF("x").createOrReplaceTempView("t_hist")
    val viaSql = spark.sql("SELECT graft_histogram(x, 8) FROM t_hist")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    val viaCol = Seq(1.0, 2.0, 2.0, 9.0).toDF("x")
      .agg(graft.functions.AdaptiveHistogram.histogram(col("x"), 8))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql === viaCol)
    // under capacity the centroids are the exact distinct values
    assert(viaSql.map(r => (r.getDouble(0), r.getLong(1))) ===
      Seq((1.0, 1L), (2.0, 2L), (9.0, 1L)))
  }

  test("graft_retention: anchored AND-flags per group") {
    Seq((1L, "signup"), (1L, "view"), (2L, "view"), (3L, "signup"))
      .toDF("u", "e").createOrReplaceTempView("t_ret")
    val rows = spark.sql(
      """SELECT u, graft_retention(e = 'signup', e = 'view') AS r
        |FROM t_ret GROUP BY u ORDER BY u""".stripMargin)
      .as[(Long, Seq[Int])].collect().toSeq
    // u1: anchor + view → [1,1]; u2: no anchor → [0,0]; u3: anchor only
    assert(rows === Seq((1L, Seq(1, 1)), (2L, Seq(0, 0)),
      (3L, Seq(1, 0))))
  }

  test("graft_window_funnel matches funnelLevelsModes incl. strict modes") {
    val evs = Seq(
      (1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "D"), (1L, 3L, "C"),
      (2L, 0L, "A"), (2L, 1L, "C"), (2L, 2L, "B"),
      (3L, 0L, "A"), (3L, 1L, "B"), (3L, 2L, "B"), (3L, 4L, "C"))
    evs.toDF("u", "t", "e").createOrReplaceTempView("t_wf")
    def run(modes: String): Map[Long, Int] = {
      val m = if (modes.isEmpty) "" else s"'$modes', "
      spark.sql(
        s"""SELECT u, graft_window_funnel(100L, ${m}t,
           |  e = 'A', e = 'B', e = 'C') AS lvl
           |FROM t_wf GROUP BY u""".stripMargin)
        .as[(Long, Int)].collect().toMap
    }
    assert(run("") === Map(1L -> 3, 2L -> 2, 3L -> 3))
    assert(run("strict_order") === Map(1L -> 2, 2L -> 1, 3L -> 3))
    assert(run("strict_deduplication") === Map(1L -> 3, 2L -> 2, 3L -> 2))
    intercept[Exception] { run("strict_bogus") }
    // modes passed as a NON-LITERAL string expression: rejected with an
    // error that names the actual mistake, not a RequireMicrosLong type
    // error on the shifted timestamp slot (r9 ADVICE)
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT u, graft_window_funnel(100L, e, t, e = 'A', e = 'B')
          |FROM t_wf GROUP BY u""".stripMargin).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("must be a string LITERAL"))),
      s"expected the modes-literal error, got: ${ex.getMessage}")
  }

  test("graft_sequence_match/count match the batch operators") {
    val evs = Seq(
      (1L, 1L, "A"), (1L, 2L, "x"), (1L, 3L, "B"), (1L, 2000000L, "C"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "A"), (2L, 4L, "B"))
    evs.toDF("u", "t", "e").createOrReplaceTempView("t_seq")
    // direct (?1)(?2): 'x' matches no condition so it is never
    // collected — A and B are adjacent in the CONSIDERED sequence for
    // user 1 (the ClickHouse docs' example semantics)
    val m = spark.sql(
      """SELECT u, graft_sequence_match('(?1)(?2)', t,
        |  e = 'A', e = 'B') AS ok FROM t_seq GROUP BY u""".stripMargin)
      .as[(Long, Boolean)].collect().toMap
    assert(m === Map(1L -> true, 2L -> true))
    val c = spark.sql(
      """SELECT u, graft_sequence_count('(?1)(?2)', t,
        |  e = 'A', e = 'B') AS n FROM t_seq GROUP BY u""".stripMargin)
      .as[(Long, Long)].collect().toMap
    assert(c === Map(1L -> 1L, 2L -> 2L))
    // time constraint in SECONDS over micro timestamps
    val tc = spark.sql(
      """SELECT u, graft_sequence_match('(?1)(?t<1)(?2)', t,
        |  e = 'A', e = 'C') AS ok FROM t_seq GROUP BY u""".stripMargin)
      .as[(Long, Boolean)].collect().toMap
    assert(tc(1L) === false) // C is 2 seconds after A
    // parity with the batch operator on the same data
    val batch = graft.operators.SequenceMatch.collectSequences(
        evs.toDF("u", "ts_us", "e")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        "u", "ts", Seq(col("e") === "A", col("e") === "B"))
    val viaOp = batch.select(col("u"),
        graft.operators.SequenceMatch.countPattern(col("__ev"), "(?1)(?2)")
          .as("n"))
      .as[(Long, Long)].collect().toMap
    assert(c === viaOp)
  }

  test("media hash SQL names match their Column forms; NULL off-path") {
    val img = Array.fill(16, 18)(1 + new scala.util.Random(42).nextInt(200))
    val bmp = graft.operators.ImageDedup.ImageBuild
      .bmp24Gray(18, 16)((x, y) => img(y)(x))
    val wav = graft.operators.AudioDedup.WavBuild
      .pcm16(Array.tabulate(520)(i => (i % 97) * 13))
    val gif = graft.operators.VideoDedup.GifBuild
      .animatedGray(18, 16, Seq((x: Int, y: Int) => img(y)(x)))
    Seq((1L, bmp, wav, gif), (2L, "junk".getBytes, "junk".getBytes,
        "junk".getBytes))
      .toDF("id", "b", "w", "g").createOrReplaceTempView("t_media")
    val rows = spark.sql(
      """SELECT id, graft_image_dhash(b) AS dh, graft_image_ahash(b) AS ah,
        |  graft_audio_hash(w) AS au, graft_video_hash(g) AS vi
        |FROM t_media ORDER BY id""".stripMargin).collect()
    assert(rows(0).getLong(1) ===
      graft.operators.ImageDedup.ImagePixels.dhashOf(bmp).get)
    assert(rows(0).getLong(2) ===
      graft.operators.ImageDedup.ImagePixels.ahashOf(bmp).get)
    assert(rows(0).getLong(3) ===
      graft.operators.AudioDedup.WavPcm.hashOf(wav).get)
    assert(rows(0).getLong(4) ===
      graft.operators.VideoDedup.GifPixels.avgHashOf(gif).get)
    assert((1 to 4).forall(rows(1).isNullAt))
  }

  test("sequence/funnel/delta time args reject TIMESTAMP at analysis") {
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "A"))
      .toDF("u", "ts", "e").createOrReplaceTempView("t_guard")
    def analysisErr(q: String): String = {
      val ex = intercept[Exception] { spark.sql(q).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      msgs(ex).mkString("; ")
    }
    // a TIMESTAMP silently cast to long would be SECONDS — off by 1e6
    // against the documented microsecond unit; must fail loudly instead
    assert(analysisErr(
      """SELECT graft_sequence_match('(?1)(?2)', ts, e='A', e='B')
        |FROM t_guard GROUP BY u""".stripMargin).contains("unix_micros"))
    assert(analysisErr(
      """SELECT graft_window_funnel(100L, ts, e='A', e='B')
        |FROM t_guard GROUP BY u""".stripMargin).contains("unix_micros"))
    assert(analysisErr(
      """SELECT graft_delta_sum(ts, 1L, 2.0)
        |FROM t_guard GROUP BY u""".stripMargin).contains("unix_micros"))
  }

  test("sequence patterns validate eagerly: bad syntax and (?N) range") {
    Seq((1L, 1L, "A")).toDF("u", "t", "e")
      .createOrReplaceTempView("t_pat")
    val oor = intercept[Exception] {
      spark.sql("""SELECT graft_sequence_match('(?3)(?1)', t,
        | e='A', e='B') FROM t_pat GROUP BY u""".stripMargin).collect()
    }
    assert(oor.getMessage.contains("(?3)") ||
      Option(oor.getCause).exists(_.getMessage.contains("(?3)")))
    val bad = intercept[Exception] {
      spark.sql("""SELECT graft_sequence_match('(?1)((', t, e='A')
        |FROM t_pat GROUP BY u""".stripMargin).collect()
    }
    assert(bad.getMessage.contains("pattern") ||
      Option(bad.getCause).exists(_.getMessage.contains("pattern")))
  }

  test("graft_delta_sum matches EventAnalytics.deltaSum semantics") {
    // resets ignored, NULL bridged, 0 when no positive delta
    val df = Seq(
      (1L, 1L, Some(1.0)), (1L, 2L, Some(3.5)), (1L, 3L, None),
      (1L, 4L, Some(2.0)), (1L, 5L, Some(4.25)),
      (2L, 1L, Some(9.0)), (2L, 2L, Some(4.0)))
      .toDF("u", "t", "v")
    df.createOrReplaceTempView("t_ds")
    val viaSql = spark.sql(
      "SELECT u, graft_delta_sum(t, t, v) FROM t_ds GROUP BY u")
      .as[(Long, Double)].collect().toMap
    assert(viaSql === Map(1L -> 4.75, 2L -> 0.0))
    val viaOp = graft.operators.EventAnalytics.deltaSum(
        df.withColumn("ts", timestamp_micros(col("t")))
          .withColumn("event_id", col("t")),
        "u", "ts", "event_id", "v")
      .select("u", "delta_sum").as[(Long, Double)].collect().toMap
    assert(viaSql === viaOp)
  }

  test("RewriteExactDistinct: opt-in bitmap plan, identical results") {
    val flag = graft.plans.RewriteExactDistinct.FlagKey
    val df = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L), (2L, 1L << 40))
      .toDF("g", "x")
    df.createOrReplaceTempView("t_rw")
    val q = "SELECT g, count(DISTINCT x) AS d FROM t_rw GROUP BY g"
    def plan(): String = spark.sql(q).queryExecution.executedPlan.toString
    def result(): Map[Long, Long] =
      spark.sql(q).as[(Long, Long)].collect().toMap

    spark.conf.unset(flag)
    val off = result()
    assert(!plan().toLowerCase.contains("groupbitmap"))
    try {
      spark.conf.set(flag, "true")
      assert(plan().toLowerCase.contains("groupbitmap"))
      // the distinct Expand machinery is gone with it
      assert(!plan().contains("Expand"))
      assert(result() === off)
      assert(off === Map(1L -> 2L, 2L -> 2L))
      // non-BIGINT distincts are out of scope and untouched
      val sPlan = spark.sql(
        "SELECT count(DISTINCT CAST(x AS STRING)) FROM t_rw")
        .queryExecution.executedPlan.toString
      assert(!sPlan.toLowerCase.contains("groupbitmap"))
      // all-NULL group returns non-null 0, like count(distinct)
      val z = spark.sql(
        "SELECT count(DISTINCT CAST(NULL AS BIGINT)) FROM t_rw")
        .as[Long].collect().head
      assert(z === 0L)
    } finally spark.conf.unset(flag)
  }

  test("non-literal parameter fails loudly") {
    (1L to 3L).toDF("x").createOrReplaceTempView("t_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_uniq_upto(x, CAST(x AS INT)) FROM t_bad")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
