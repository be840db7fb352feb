package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream interval join — the streaming half of the
  * relational family (§2.6 extension, the attribution/sessionization
  * join: impressions × clicks within an attribution window).
  *
  * Both sides carry a watermark and the join condition bounds the
  * event-time distance, so Spark derives a state-retention bound PER
  * SIDE: a buffered left row is dropped once the right watermark passes
  * `leftTs + upper`, and vice versa — state is
  * O(rate × (lateness + window)), independent of stream lifetime. That
  * bound is exactly why both the watermark AND the interval condition
  * are required here (an unbounded stream-stream equi join grows state
  * forever; Spark rejects it in append mode without them).
  *
  * Scale shape: both streams shuffle-partition by the join key — the
  * same hash partitioning — so each state-store partition joins
  * co-located slices; no broadcast, no re-shuffle per micro-batch
  * beyond the two key exchanges.
  */
object StreamJoin {

  /** Inner-join `left` and `right` on `keyCol` where
    * `rightTs ∈ [leftTs + lower, leftTs + upper]` (SQL interval strings,
    * e.g. "0 seconds", "10 minutes"). `lateness` is each side's
    * watermark delay. Column sets must be disjoint apart from `keyCol`. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      lower: String, upper: String, lateness: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness).alias("r")
    l.join(r,
      expr(s"""l.$keyCol = r.$keyCol AND
        r.$rightTs >= l.$leftTs + interval $lower AND
        r.$rightTs <= l.$leftTs + interval $upper"""))
      .drop(r(keyCol))
  }
}
