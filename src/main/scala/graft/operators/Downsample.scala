package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series downsampling for dashboard-scale rendering: M4 (the
  * error-free min/max/first/last-per-pixel-bucket aggregation) and
  * ClickHouse's `largestTriangleThreeBuckets(n)(t, v)` (LTTB, Steinarsson
  * 2013 — the perceptual line-simplification pick).
  *
  * Scale shapes differ deliberately:
  *  - [[m4]] is a plain combinable aggregate — one key-hash shuffle,
  *    map-side partials, any series length. This is the 100 TB path.
  *  - [[lttb]] is inherently sequential (each pick depends on the
  *    previous pick), so it runs per key with the key's series gathered
  *    in one task — the SAME per-key memory contract as every ClickHouse
  *    `-Array`/sequence aggregate (CH evaluates LTTB on a single node's
  *    aggregate state too). Use it on per-series data (a metric line,
  *    not a corpus); use [[m4]] when series length is unbounded.
  */
object Downsample {

  /** M4 per (key, bucket): (key, bucket, n, v_first, v_min, v_max,
    * v_last), where bucket = floor(epoch_µs / bucketUs). First/last are
    * tie-broken by `tieCol` so the result is total-order deterministic.
    */
  def m4(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucket width must be positive, got $bucketUs")
    val t = unix_micros(col(tsCol))
    // exact floor-division: `/` on longs is double division in Spark and
    // floor() of a 1-ulp-low quotient can flip on exact multiples; the
    // mod-subtract keeps every step in exact integer space (the final
    // divide is of an exact multiple, hence exact in double too)
    df.withColumn("__bucket",
      ((t - pmod(t, lit(bucketUs))) / lit(bucketUs)).cast("long"))
      .withColumn("__ord", struct(t.as("t"), col(tieCol).as("tie")))
      .groupBy(col(keyCol), col("__bucket").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col(valCol), col("__ord")).as("v_first"),
        min(col(valCol)).as("v_min"),
        max(col(valCol)).as("v_max"),
        max_by(col(valCol), col("__ord")).as("v_last"))
  }

  /** LTTB to `threshold` points per key. Output: (key, t, v) — the
    * selected points, t in epoch-µs. Steinarsson's fixed semantics:
    * first and last points always kept; the interior is split into
    * `threshold − 2` equal-count buckets; from each bucket pick the
    * point maximizing the triangle area with the PREVIOUS pick and the
    * AVERAGE of the NEXT bucket (the last interior bucket uses the
    * final point). Ties on area keep the earliest point. Series with
    * ≤ threshold points pass through unchanged.
    */
  def lttb(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      threshold: Int): DataFrame = {
    require(threshold >= 3, s"threshold must be >= 3, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"), col(valCol).cast("double").as("v"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val pts = it.map { case (_, t, v) => (t, v) }.toArray.sorted
        select(pts, threshold).map { case (t, v) => (k, t, v) }
      }
      .toDF(keyCol, "t", "v")
  }

  /** The sequential core, shared with the spec's brute-force check. */
  private[operators] def select(
      pts: Array[(Long, Double)], threshold: Int): Seq[(Long, Double)] = {
    val n = pts.length
    if (n <= threshold) return pts.toSeq
    val out = collection.mutable.ArrayBuffer[(Long, Double)](pts(0))
    val nBuckets = threshold - 2
    // interior points [1, n-1) split into nBuckets equal-count ranges
    def lo(b: Int): Int = 1 + ((n - 2).toLong * b / nBuckets).toInt
    var prev = pts(0)
    var b = 0
    while (b < nBuckets) {
      val (s, e) = (lo(b), lo(b + 1))
      // anchor: average of the NEXT bucket, or the final point
      val (ax, ay) =
        if (b == nBuckets - 1) (pts(n - 1)._1.toDouble, pts(n - 1)._2)
        else {
          val (s2, e2) = (lo(b + 1), lo(b + 2))
          var sx = 0.0d; var sy = 0.0d; var i = s2
          while (i < e2) { sx += pts(i)._1; sy += pts(i)._2; i += 1 }
          (sx / (e2 - s2), sy / (e2 - s2))
        }
      var best = s; var bestArea = -1.0d; var i = s
      while (i < e) {
        val area = math.abs(
          (prev._1 - ax) * (pts(i)._2 - prev._2) -
            (prev._1 - pts(i)._1) * (ay - prev._2))
        if (area > bestArea) { bestArea = area; best = i }
        i += 1
      }
      out += pts(best); prev = pts(best); b += 1
    }
    out += pts(n - 1)
    out.toSeq
  }
}
