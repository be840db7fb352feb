package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Live `exponentialTimeDecayedAvg` — the streaming twin of
  * [[graft.operators.EventAnalytics.timeDecayedAvg]] (q81): per key,
  * the decayed sums are kept ANCHORED AT THE LATEST SEEN EVENT TIME in
  * the state store; each new event first re-anchors the sums by
  * 2^(−Δt/halflife) and then adds itself with weight 1. Algebraically
  * identical to the batch closed form Σv·w/Σw (exponential decay
  * composes: w(t₁→t₃) = w(t₁→t₂)·w(t₂→t₃)), so the spec pins
  * cross-batch parity with the batch operator to float tolerance.
  *
  * State per key: three numbers (Σw, Σwv, t_last) + version — the
  * O(1)-state streaming form the closed-form batch rewrite exists to
  * enable. Same in-batch (t, tie) ordering and per-key cross-batch
  * event-time monotonicity contract as [[StreamingFunnel]]; a late
  * straggler (t < t_last) is folded with weight 2^(−(t_last−t)/h)
  * against the UNCHANGED anchor, which is exactly its batch weight.
  */
object StreamingDecayedAvg {

  /** `halflifeUs` is stored so a restart with a different halflife
    * fails loudly instead of silently mixing decay rates (the sums are
    * only meaningful under the halflife they were folded with). */
  final case class DecayState(
      ver: Int, halflifeUs: Long, sumW: Double, sumWV: Double,
      tLast: Long, n: Long)

  /** v2: added the halflife parameter fingerprint. */
  val StateVersion = 2

  private[streaming] final case class Out(
      key: Long, n_events: Long, ema: Double)

  def levels(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valCol: String, halflifeUs: Long): DataFrame = {
    require(halflifeUs > 0, s"halflife must be positive, got $halflifeUs")
    StreamingKeys.requireIntegral(events, keyCol, "StreamingDecayedAvg")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col(valCol).isNotNull)
      .select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("t"),
        col(tieCol).cast("long").as("tie"),
        col(valCol).cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[DecayState, Out](GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[DecayState]) =>
          val evs = it.toArray.sortBy(e => (e._2, e._3))
          var s = state.getOption.getOrElse(
            DecayState(StateVersion, halflifeUs, 0.0, 0.0, Long.MinValue, 0L))
          if (s.ver != StateVersion)
            throw new IllegalStateException(
              s"StreamingDecayedAvg state version ${s.ver} != expected " +
                s"$StateVersion: restart from an incompatible checkpoint")
          if (s.halflifeUs != halflifeUs)
            throw new IllegalStateException(
              s"StreamingDecayedAvg restarted with halflife $halflifeUs " +
                s"but the checkpointed state was folded under " +
                s"${s.halflifeUs} — restate from a fresh checkpoint " +
                "directory")
          evs.foreach { case (_, t, _, v) =>
            if (s.n == 0L) {
              s = s.copy(sumW = 1.0, sumWV = v, tLast = t, n = 1L)
            } else if (t >= s.tLast) {
              // re-anchor the sums at the newer time, then add weight-1
              val decay = math.pow(0.5, (t - s.tLast).toDouble / halflifeUs)
              s = s.copy(sumW = s.sumW * decay + 1.0,
                sumWV = s.sumWV * decay + v, tLast = t, n = s.n + 1)
            } else {
              // late straggler: fold at ITS batch weight, anchor unmoved
              val w = math.pow(0.5, (s.tLast - t).toDouble / halflifeUs)
              s = s.copy(sumW = s.sumW + w, sumWV = s.sumWV + w * v,
                n = s.n + 1)
            }
          }
          state.update(s)
          Out(key, s.n, s.sumWV / s.sumW)
      }
      .toDF("key", "n_events", "ema")
  }
}
