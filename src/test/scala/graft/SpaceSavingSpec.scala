package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{ColumnBridge, SpaceSavingBuffer, SpaceSavingTopK}

class SpaceSavingSpec extends SparkSuite {
  import spark.implicits._

  /** SpaceSaving invariants vs exact counts: every tracked item has
    * est-err <= true <= est; when never filled, counts are exact; any
    * item with true > N/capacity must be tracked (classic guarantee). */
  private def checkInvariants(
      buf: SpaceSavingBuffer, exact: Map[String, Long], n: Long): Unit = {
    buf.counters.foreach { case (k, (est, err)) =>
      val t = exact.getOrElse(k, 0L)
      assert(est >= t, s"$k est=$est < true=$t")
      assert(est - err <= t, s"$k est-err=${est - err} > true=$t")
    }
    val bound = n / buf.capacity
    exact.foreach { case (k, t) =>
      if (t > bound)
        assert(buf.counters.contains(k), s"heavy $k (true=$t > N/C=$bound) absent")
    }
  }

  test("exact when capacity exceeds vocabulary") {
    val buf = new SpaceSavingBuffer(16)
    val items = Seq("a", "b", "a", "c", "a", "b")
    items.foreach(buf.update)
    assert(buf.counters("a") === ((3L, 0L)))
    assert(buf.counters("b") === ((2L, 0L)))
    assert(buf.counters("c") === ((1L, 0L)))
    assert(!buf.filled)
  }

  test("eviction keeps invariants on a skewed stream") {
    val rnd = new Random(1)
    val buf = new SpaceSavingBuffer(8)
    // zipfish: item i with weight ~ 1/(i+1), vocabulary 40 >> capacity 8
    val stream = Seq.fill(5000)("w" + math.min(
      (1 / (rnd.nextDouble() + 1e-9)).toInt % 40, 39))
    stream.foreach(buf.update)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    checkInvariants(buf, exact, stream.size.toLong)
    assert(buf.filled)
    assert(buf.counters.size === 8)
  }

  test("merge invariants hold across random partitioned streams") {
    val rnd = new Random(42)
    (0 until 10).foreach { trial =>
      val nParts = 2 + rnd.nextInt(4)
      val vocab = 5 + rnd.nextInt(60)
      val parts = Seq.fill(nParts) {
        Seq.fill(200 + rnd.nextInt(800))("t" + rnd.nextInt(vocab))
      }
      val bufs = parts.map { p =>
        val b = new SpaceSavingBuffer(8)
        p.foreach(b.update)
        b
      }
      val merged = bufs.reduce { (a, b) => a.merge(b); a }
      val all = parts.flatten
      val exact = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      checkInvariants(merged, exact, all.size.toLong)
      assert(merged.counters.size <= 8, s"trial $trial overflow")
    }
  }

  test("weighted updates keep invariants (topKWeighted semantics)") {
    val rnd = new Random(3)
    (0 until 10).foreach { trial =>
      val vocab = 4 + rnd.nextInt(30)
      val updates = Seq.fill(600)(("i" + rnd.nextInt(vocab), 1L + rnd.nextInt(9)))
      val buf = new SpaceSavingBuffer(6)
      updates.foreach { case (k, w) => buf.update(k, w) }
      val exact = updates.groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).sum }
      val n = updates.map(_._2).sum
      checkInvariants(buf, exact, n)
      assert(buf.counters.size <= 6, s"trial $trial")
    }
  }

  test("non-positive weights are no-ops") {
    val buf = new SpaceSavingBuffer(4)
    buf.update("a", 0L)
    buf.update("a", -5L)
    assert(buf.counters.isEmpty)
    buf.update("a", 3L)
    assert(buf.counters("a") === ((3L, 0L)))
  }

  test("spark aggregate with weight column") {
    val data = Seq(("x", 5L), ("y", 2L), ("x", 1L), ("z", 0L))
    val df = data.toDF("item", "w")
    val sk = df.agg(ColumnBridge.col(
      SpaceSavingTopK(ColumnBridge.expr(col("item")), 8,
        weight = Some(ColumnBridge.expr(col("w"))))
        .toAggregateExpression()).as("sk"))
    val rows = sk.select(explode(col("sk")).as("c"))
      .select("c.term", "c.est", "c.err")
      .as[(String, Long, Long)].collect()
      .map { case (t, e, r) => t -> ((e, r)) }.toMap
    assert(rows === Map("x" -> ((6L, 0L)), "y" -> ((2L, 0L))))
  }

  test("serialization round-trips") {
    val buf = new SpaceSavingBuffer(4)
    Seq("x", "y", "x", "z", "q", "r").foreach(buf.update)
    val agg = SpaceSavingTopK(ColumnBridge.expr(lit("unused")), 4)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.counters === buf.counters)
    assert(back.filled === buf.filled)
    assert(back.capacity === buf.capacity)
  }

  test("serialization survives a term beyond writeUTF's 64KB limit") {
    // one giant unbroken token (a real hazard for bigram terms over raw
    // corpus text); writeUTF would throw UTFDataFormatException here
    val big = "x" * 70000
    val buf = new SpaceSavingBuffer(4)
    buf.update(big); buf.update(big); buf.update("small")
    val agg = SpaceSavingTopK(ColumnBridge.expr(lit("unused")), 4)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.counters(big) === ((2L, 0L)))
    assert(back.counters("small") === ((1L, 0L)))
  }

  test("spark aggregate: partial+merge path matches invariants, nulls skipped") {
    val rnd = new Random(7)
    val data = Seq.fill(4000)(Some("g" + rnd.nextInt(50))) ++
      Seq.fill(100)(Option.empty[String])
    val df = data.toDF("item").repartition(8)
    val sk = df.agg(ColumnBridge.col(
      SpaceSavingTopK(ColumnBridge.expr(col("item")), 12)
        .toAggregateExpression()).as("sk"))
    val rows = sk.select(explode(col("sk")).as("c"))
      .select("c.term", "c.est", "c.err")
      .as[(String, Long, Long)].collect()
    assert(rows.length === 12)
    val exact = data.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    rows.foreach { case (term, est, err) =>
      val t = exact.getOrElse(term, 0L)
      assert(est >= t && est - err <= t, s"$term est=$est err=$err true=$t")
    }
    // est-desc order with term tie-break
    assert(rows.map(-_._2).toSeq === rows.map(-_._2).sorted.toSeq)
  }
}
