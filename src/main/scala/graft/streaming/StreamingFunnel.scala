package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.FunnelScan

/** Incremental `windowFunnel` over a stream — the streaming twin of
  * [[graft.operators.EventAnalytics.funnelLevelsModes]], folding the
  * SAME chain-update recurrence ([[graft.functions.FunnelScan]] — one
  * implementation, batch and streaming cannot drift) into per-key state
  * in the state store. Each micro-batch emits the key's CURRENT funnel
  * level (Update mode), so a dashboard reads conversion depth live
  * instead of re-scanning history.
  *
  * Contract: events are folded in (event-time, tie) order WITHIN each
  * micro-batch, and batches fold in arrival order — per-key event-time
  * monotonicity ACROSS batches is the caller's contract (what a
  * per-key-partitioned Kafka topic provides). A late straggler folds at
  * its arrival position; the recurrence's window bound still applies to
  * its event time, which mirrors ClickHouse's own behavior when rows
  * are inserted out of order into an insertion-ordered funnel.
  *
  * State per key: 16·n_steps + ~4 bytes, versioned like
  * [[StatefulDedup]] so restarts from a checkpoint written by a
  * different state layout fail loudly instead of miscounting.
  */
object StreamingFunnel {

  /** Versioned, encoder-friendly mirror of [[FunnelScan.State]].
    * `paramFp` fingerprints the query parameters the state is only
    * valid under (steps, window, strict flags): a restart that changes
    * any of them fails loudly instead of silently folding incompatible
    * per-key state — same discipline as [[StreamingTopK]] capacity. */
  final case class FunnelState(
      ver: Int, paramFp: Long, first: Seq[Long], last: Seq[Long],
      set: Seq[Boolean], firstEvent: Boolean, interrupted: Boolean,
      forced: Int)

  /** Bump on any change to state semantics or layout.
    * v2: added `forced` (ClickHouse strict-mode interrupt levels) and
    * `paramFp`. */
  val StateVersion = 2

  private[streaming] def paramFingerprint(
      steps: Seq[String], windowUs: Long, strictDedup: Boolean,
      strictOrder: Boolean, strictIncrease: Boolean): Long = {
    val repr = steps.mkString("\u0000") + "\u0001" +
      s"$windowUs/$strictDedup/$strictOrder/$strictIncrease"
    scala.util.hashing.MurmurHash3.stringHash(repr).toLong * 1000003L +
      steps.size
  }

  private[streaming] final case class Out(key: Long, funnel_level: Int)

  /** `events` is a STREAMING DataFrame; output (key, funnel_level) in
    * Update mode, one row per key touched in the micro-batch. */
  def levels(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long,
      strictDedup: Boolean = false, strictOrder: Boolean = false,
      strictIncrease: Boolean = false): DataFrame = {
    require(steps.size >= 2, s"need >= 2 funnel steps, got ${steps.size}")
    StreamingKeys.requireIntegral(events, keyCol, "StreamingFunnel")
    val mask = steps.zipWithIndex
      .map { case (s, i) => when(col(typeCol) === s, lit(1L << i)).otherwise(0L) }
      .reduce(_.bitwiseOR(_))
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(
      col(keyCol).cast("long").as("key"),
      unix_micros(col(tsCol)).as("t"),
      mask.as("mask"),
      // tie only stabilizes the in-batch (t, mask, tie) sort — the
      // recurrence itself never sees it
      col(tieCol).cast("long").as("tie"))
    val n = steps.size
    val fp = paramFingerprint(steps, windowUs, strictDedup, strictOrder,
      strictIncrease)
    base.as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, Out](GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[FunnelState]) =>
          val evs = it.toArray.sortBy(e => (e._2, e._3, e._4))
          val prev = state.getOption.getOrElse(
            FunnelState(StateVersion, fp, Seq.fill(n)(0L), Seq.fill(n)(0L),
              Seq.fill(n)(false), firstEvent = false, interrupted = false,
              forced = -1))
          if (prev.ver != StateVersion)
            throw new IllegalStateException(
              s"StreamingFunnel state version ${prev.ver} != expected " +
                s"$StateVersion: restart from an incompatible checkpoint — " +
                "restate from a fresh checkpoint directory")
          if (prev.paramFp != fp)
            throw new IllegalStateException(
              "StreamingFunnel restarted with different parameters " +
                "(steps/window/strict flags) than the checkpointed state " +
                "was built under — restate from a fresh checkpoint directory")
          val st = new FunnelScan.State(
            prev.first.toArray, prev.last.toArray, prev.set.toArray,
            prev.firstEvent, prev.interrupted, prev.forced)
          FunnelScan.advance(st, evs.map(_._2), evs.map(_._3), windowUs,
            strictDedup, strictOrder, strictIncrease)
          state.update(FunnelState(StateVersion, fp, st.first.toSeq,
            st.last.toSeq, st.set.toSeq, st.firstEvent, st.interrupted,
            st.forced))
          Out(key, FunnelScan.level(st))
      }
      .toDF("key", "funnel_level")
  }
}
