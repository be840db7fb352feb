package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.SpaceSavingBuffer

/** Live heavy-hitters over a stream — ClickHouse `topK` kept
  * incrementally in the state store: per group key, one
  * [[SpaceSavingBuffer]] (≤ capacity counters, the [[StatefulDedup]] /
  * [[StreamingFunnel]] bounded-state discipline) folded batch by batch
  * via `mapGroupsWithState`; each micro-batch emits the key's CURRENT
  * top-k (Update mode), so a dashboard reads the leaderboard live.
  *
  * The sequential fold is SpaceSaving's native form (the batch
  * aggregate's partial/merge path is the adaptation, not this), so the
  * classic guarantees hold cumulatively across batches: est−err ≤ true
  * ≤ est for tracked items, and any item with true count > N/capacity
  * is present. Until the buffer first fills, counts are EXACT — the
  * spec pins cross-batch exactness under capacity and the invariants
  * over it.
  *
  * State per key: ≤ capacity (term, est, err) triples, versioned so a
  * restart from an incompatible checkpoint fails loudly.
  */
object StreamingTopK {

  /** Versioned, encoder-friendly mirror of [[SpaceSavingBuffer]]. */
  final case class TopKState(
      ver: Int, capacity: Int, filled: Boolean,
      terms: Seq[String], ests: Seq[Long], errs: Seq[Long])

  /** Bump on any change to state semantics or layout. */
  val StateVersion = 1

  private[streaming] final case class Out(
      key: Long, terms: Seq[String], ests: Seq[Long], errs: Seq[Long])

  /** `events` is a STREAMING DataFrame; output (key, terms, ests,
    * errs) in Update mode — the ≤ `k` current heavy hitters est-desc
    * (term-asc ties), one row per key touched in the micro-batch.
    * `capacity` is the summary width (≥ k; more = tighter bounds). */
  def topK(
      events: DataFrame, keyCol: String, itemCol: String,
      k: Int, capacity: Int): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    StreamingKeys.requireIntegral(events, keyCol, "StreamingTopK")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("key"),
        col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[TopKState, Out](GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[TopKState]) =>
          val buf = new SpaceSavingBuffer(capacity)
          state.getOption.foreach { s =>
            if (s.ver != StateVersion)
              throw new IllegalStateException(
                s"StreamingTopK state version ${s.ver} != expected " +
                  s"$StateVersion: restart from an incompatible checkpoint")
            require(s.capacity == capacity,
              s"state capacity ${s.capacity} != query capacity $capacity " +
                "— restate from a fresh checkpoint directory")
            buf.filled = s.filled
            s.terms.indices.foreach(i =>
              buf.counters.update(s.terms(i), (s.ests(i), s.errs(i))))
          }
          it.foreach { case (_, item) => buf.update(item) }
          val sorted = buf.counters.toSeq
            .sortBy { case (t, (est, _)) => (-est, t) }
          state.update(TopKState(StateVersion, capacity, buf.filled,
            sorted.map(_._1), sorted.map(_._2._1), sorted.map(_._2._2)))
          val top = sorted.take(k)
          Out(key, top.map(_._1), top.map(_._2._1), top.map(_._2._2))
      }
      .toDF("key", "terms", "ests", "errs")
  }
}
