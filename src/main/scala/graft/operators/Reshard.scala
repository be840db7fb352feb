package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Deterministic corpus reshard — the "global shuffle" stage a training
  * pipeline runs last: assign every document a pseudo-random but fully
  * reproducible position (seeded hash order) in one of `nShards` output
  * shards, so the training job reads shards sequentially and still sees
  * a shuffled corpus, and any re-run with the same seed reproduces the
  * exact byte order. No RNG state anywhere: order is a pure function of
  * (id, seed), so the operator is idempotent under retries and
  * speculative execution — the property `rand()`-based shuffles lose.
  *
  * Scale shape: shard assignment is a map-side `pmod(xxhash64(id, seed),
  * n)`; positions need one per-shard sort of (hash, id) rows — 16 bytes
  * per doc, text stays in the lake. `nShards` bounds the sort
  * parallelism (each shard is one window partition), so at 100 TB you
  * size it like output-file count — thousands — not like
  * `shuffle.partitions`; a tiny nShards would serialize the sort the
  * same way it would serialize training reads. No globally-ordered
  * window anywhere — the single-partition-window trap this codebase
  * bans.
  */
object Reshard {

  /** (id, h, shard, pos): `h` the seeded hash (echoed so audits can
    * re-derive everything downstream of it), `shard` in [0, nShards),
    * `pos` the 1-based rank within the shard by (h, id) — the id
    * tiebreak makes equal-hash rows (or duplicate ids) deterministic. */
  def reshard(docs: DataFrame, idCol: String,
      nShards: Int, seed: Long): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = ColumnBridge.col(
      new XxHash64(Seq(ColumnBridge.expr(col(idCol))), seed))
    docs
      .select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol)))
        .cast("long"))
  }
}
