package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{BitmapAgg, Roaring64}

/** [[graft.functions.Roaring64]] + [[graft.functions.BitmapAgg]]: container
  * promotion, set algebra vs scala.collection.Set models on random data,
  * serialization round-trips, the ClickHouse cap on serialized width, and
  * the SQL-level aggregate vs a `count(distinct)` model. */
class RoaringSpec extends SparkSuite {
  import spark.implicits._

  private def model(bm: Roaring64): Set[Long] = {
    val b = Set.newBuilder[Long]
    bm.foreach(b += _)
    b.result()
  }

  private def fromSet(s: Iterable[Long]): Roaring64 = {
    val bm = new Roaring64()
    s.foreach(bm.add)
    bm
  }

  test("add/contains/cardinality against a set model, random 64-bit keys") {
    val rnd = new Random(7)
    val ref = scala.collection.mutable.Set[Long]()
    val bm = new Roaring64()
    (0 until 20000).foreach { _ =>
      // mix: clustered low ids (same chunk), scattered full-range keys,
      // negatives (high unsigned chunks)
      val v = rnd.nextInt(3) match {
        case 0 => rnd.nextInt(100000).toLong
        case 1 => rnd.nextLong()
        case _ => -1L - rnd.nextInt(1000)
      }
      ref += v
      bm.add(v)
    }
    assert(bm.cardinality === ref.size.toLong)
    assert(model(bm) === ref.toSet)
    ref.take(100).foreach(v => assert(bm.contains(v)))
    assert(!bm.contains(1L << 62 | 12345L) || ref.contains(1L << 62 | 12345L))
  }

  test("array container promotes to bitmap and stays correct across the 4096 boundary") {
    val bm = new Roaring64()
    // 5000 even values in one 64 Ki chunk: crosses ArrayMax mid-stream
    (0 until 5000).foreach(i => bm.add(2L * i))
    assert(bm.cardinality === 5000L)
    assert(bm.contains(0L) && bm.contains(9998L) && !bm.contains(1L))
    // round-trip preserves the promoted form
    val rt = Roaring64.deserialize(bm.serialize())
    assert(rt.cardinality === 5000L)
    assert(model(rt) === model(bm))
  }

  test("or/and/xor match set algebra on random chunk-straddling sets") {
    val rnd = new Random(13)
    (0 until 20).foreach { _ =>
      val a = Set.fill(rnd.nextInt(3000))(rnd.nextInt(200000).toLong - 50000L)
      val b = Set.fill(rnd.nextInt(3000))(rnd.nextInt(200000).toLong - 50000L)
      val ba = fromSet(a)
      val bb = fromSet(b)
      assert(model(ba.and(bb)) === (a & b))
      assert(model(ba.xor(bb)) === (a.diff(b) | b.diff(a)))
      ba.or(bb) // destructive last
      assert(model(ba) === (a | b))
      assert(model(bb) === b, "or must not mutate its argument")
    }
  }

  test("serialized width is bounded: min(2B/member, 8KiB/chunk) + headers") {
    // sparse: n members scattered → ~2 bytes each + per-chunk headers
    val sparse = fromSet((0 until 1000).map(i => i.toLong * 1000000L))
    assert(sparse.serialize().length <= 1000 * (8 + 1 + 4 + 2) + 4)
    // dense: 64 Ki contiguous members → exactly one 8 KiB bitmap container
    val dense = fromSet((0L until 65536L))
    val denseBytes = dense.serialize().length
    assert(denseBytes <= 4 + 8 + 1 + 8192)
    assert(dense.cardinality === 65536L)
  }

  test("SQL groupBitmap equals count(distinct); two-level Or/And/Xor vs model") {
    val rnd = new Random(99)
    val rows = Seq.fill(4000)((rnd.nextInt(5), rnd.nextInt(4), rnd.nextInt(300).toLong))
    val df = rows.toDF("g", "slice", "uid").repartition(7)

    val direct = df.groupBy($"g")
      .agg(BitmapAgg.groupBitmap($"uid").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._3).distinct.size.toLong
    }
    assert(direct === exact)

    val two = df.groupBy($"g", $"slice")
      .agg(BitmapAgg.groupBitmapState($"uid").as("st"))
      .groupBy($"g")
      .agg(BitmapAgg.groupBitmapOrCard($"st").as("o"),
        BitmapAgg.groupBitmapAndCard($"st").as("a"),
        BitmapAgg.groupBitmapXorCard($"st").as("x"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val m = rows.groupBy(_._1).map { case (g, rs) =>
      val slices = rs.groupBy(_._2).view.mapValues(_.map(_._3).toSet).values.toSeq
      val or = slices.reduce(_ | _)
      val and = slices.reduce(_ & _)
      val xor = slices.reduce((p, q) => p.diff(q) | q.diff(p))
      g -> ((or.size.toLong, and.size.toLong, xor.size.toLong))
    }
    assert(two === m)
  }

  test("nulls ignored; empty group evaluates to 0") {
    val df = Seq[(Int, Option[Long])]((1, Some(5L)), (1, None), (1, Some(5L)))
      .toDF("g", "uid")
    val r = df.groupBy($"g").agg(BitmapAgg.groupBitmap($"uid").as("n")).collect()
    assert(r.head.getLong(1) === 1L)
    val empty = df.filter($"g" === 99)
      .agg(BitmapAgg.groupBitmap($"uid").as("n")).collect()
    assert(empty.head.getLong(0) === 0L)
  }
}
