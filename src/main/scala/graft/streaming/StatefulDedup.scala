package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch first-seen deduplication as a genuinely *stateful* streaming
  * operator (SURVEY §2.6 "stateful streaming op"): the streaming twin of the
  * reference's in-memory seriesQuota/bmSeries first-seen bitmap
  * (output/clickhouse.go:110-159), holding one state entry per key in the
  * Structured Streaming state store instead of a process-local roaring
  * bitmap — so it shards with the stream (state is hash-partitioned by key
  * across executors), survives restarts via the checkpoint, and is exactly
  * recomputed on failure.
  *
  * Contrast with [[SeriesParquetSink]], which keeps the same first-seen
  * semantics in the *target table* via anti-join: state-in-table is the
  * right shape when the sink itself is the source of truth; state-in-store
  * (this operator) is right when the dedup must happen before the sink
  * (e.g. suppressing duplicate series rows from the metric stream itself).
  *
  * State-store provider is a deployment dial, deliberately not set here:
  * the default HDFS-backed store keeps ALL state in executor heap — fastest
  * while state fits (measured 7.8 s vs RocksDB's 9.8 s on the 450 K-key
  * bench intake, `tools/StateStoreBench`), but an OOM wall when it doesn't.
  * At 100 TB-scale key domains set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `RocksDBStateStoreProvider` (+ changelog checkpointing): state moves
  * off-heap and spills to local disk, trading ~25% per-batch overhead for
  * unbounded state. Both providers pass this operator's restart spec.
  */
object StatefulDedup {

  /** Emit only the first row ever seen per value of `keyCol` (across all
    * micro-batches). State: one boolean per key, partitioned by key.
    *
    * `stateTtlMs > 0` bounds state growth for unbounded key domains: a key
    * idle longer than the TTL is forgotten (and would be re-emitted if it
    * reappears) — the same memory/exactness dial as the reference's
    * seriesQuota eviction. 0 = keep forever (exact; state grows with the
    * distinct-key count, which is what the reference's bitmap does too).
    */
  def firstSeen(df: DataFrame, keyCol: String, stateTtlMs: Long = 0L): DataFrame = {
    implicit val rowEnc: Encoder[Row] = Encoders.row(df.schema)
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val keyIdx = df.schema.fieldIndex(keyCol)
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // null keys get a non-printable sentinel prefix so they can never
    // collide with a row whose key is the literal string "null"
    // (String.valueOf(null) == "null"); real keys are prefixed too so
    // the two domains stay disjoint.
    // STATE-COMPAT: this "k"+v / "\u0000null" encoding (introduced after
    // the unprefixed String.valueOf encoding) changes every state-store
    // group key — a job restarted from a checkpoint written by the old
    // encoding sees all previously-seen keys as unseen and re-admits one
    // duplicate per key, once, after the upgrade. Deliberate trade: the
    // old encoding silently merged null-keyed rows with literal-"null"
    // keys. Operators upgrading a long-lived stream should either drain
    // + restart with a fresh checkpoint or accept the one-shot re-admit.
    df.groupByKey { r =>
      val v = r.get(keyIdx)
      if (v == null) "\u0000null" else "k" + v
    }(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            Iterator.empty
          } else {
            state.update(true)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            rows.take(1)
          }
      }
  }
}
