package graft

import org.apache.spark.sql.functions._

import graft.operators.Reshard

/** Reshard determinism and structure: exact partition of the input,
  * contiguous 1-based positions per shard, hash-consistent assignment,
  * same-seed reproducibility, different-seed different order.
  */
class ReshardSpec extends SparkSuite {

  import spark.implicits._

  private val ids = (0L until 100L).toDF("doc_id")

  test("partition of the input with contiguous per-shard positions") {
    val out = Reshard.reshard(ids, "doc_id", nShards = 8, seed = 7L)
    val rows = out.collect()
    assert(rows.length === 100)
    assert(rows.map(_.getLong(0)).toSet === (0L until 100L).toSet)
    // shard consistent with the echoed hash
    rows.foreach { r =>
      assert(r.getInt(2) === (((r.getLong(1) % 8) + 8) % 8).toInt)
    }
    // positions are 1..k per shard, ordered by (h, id)
    rows.groupBy(_.getInt(2)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(1), r.getLong(0)))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to rs.length).toSeq)
    }
  }

  test("same seed reproduces bit-identical layout; new seed reorders") {
    val a = Reshard.reshard(ids, "doc_id", 8, 7L)
      .orderBy("shard", "pos").collect().toSeq
    val b = Reshard.reshard(ids, "doc_id", 8, 7L)
      .orderBy("shard", "pos").collect().toSeq
    assert(a === b)
    val c = Reshard.reshard(ids, "doc_id", 8, 8L)
      .orderBy("shard", "pos").collect().map(_.getLong(0)).toSeq
    assert(a.map(_.getLong(0)).toSeq !== c)
  }
}
