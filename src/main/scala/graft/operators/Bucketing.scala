package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the standing answer to "this join
  * shuffles 100 TB every night". Writing both sides `bucketBy(n, key)`
  * once pins an identical hash partitioning INTO THE TABLE LAYOUT, so
  * every later equi-join or aggregation on that key reads co-located
  * buckets and plans a SortMergeJoin with NO Exchange on either side —
  * the shuffle is paid once at write time, then amortized over every
  * downstream read ([[graft.streaming.SinkWriter]]'s shard routing is
  * the streaming cousin; this is the lake-side one).
  *
  * The 100 TB discipline encoded here:
  *  - both sides MUST share the bucket count — mismatched counts
  *    silently fall back to a full shuffle (Spark only elides the
  *    exchange when the output partitioning subsumes the required
  *    distribution), so [[colocatedJoin]] checks and fails loudly;
  *  - `sortBy` the same key at write time; NOTE that since Spark 3.0
  *    the scan reports no output ordering by default (multi-file
  *    buckets made trusting it unsafe), so the join still plans a
  *    cheap in-bucket Sort — the data-motion win is the Exchange
  *    elision; flipping
  *    `spark.sql.legacy.bucketedTableScan.outputOrdering` on a
  *    one-file-per-bucket layout (which [[writeBucketed]] guarantees)
  *    removes the Sorts too, and the spec demonstrates both modes;
  *  - bucket counts should be sized to the TARGET cluster's
  *    parallelism, not the writer's (a 1000-executor reader of
  *    32-bucket tables has 968 idle cores in the join stage).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table
    * (session catalog). One shuffle now, none on any later key join.
    * The pre-write `repartition(nBuckets, key)` uses the same hash as
    * the bucket spec, so each bucket lands as ONE file — with several
    * files per bucket the reader can't trust the per-file sort and the
    * join re-sorts every bucket, quietly un-earning half the win. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.repartition(nBuckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  private def bucketSpecOf(spark: SparkSession, table: String) =
    spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec
      .getOrElse(throw new IllegalArgumentException(
        s"table $table is not bucketed — colocatedJoin would silently shuffle"))

  /** Equi-join two same-bucketed tables on `key`, guaranteed
    * exchange-free (bucket counts AND bucket columns are verified up
    * front rather than letting the planner quietly insert the shuffle
    * back — a table bucketed on a different column passes the count
    * check but its scan partitioning can't satisfy the join). */
  def colocatedJoin(
      spark: SparkSession, left: String, right: String,
      key: String): DataFrame = {
    val (ls, rs) = (bucketSpecOf(spark, left), bucketSpecOf(spark, right))
    require(ls.numBuckets == rs.numBuckets,
      s"bucket counts differ ($left=${ls.numBuckets}, " +
        s"$right=${rs.numBuckets}): the exchange-free plan needs " +
        "identical bucketing — rewrite one side")
    // the SESSION's resolver, not a hardcoded case rule: by default
    // Spark resolves columns case-insensitively (bucket col "K" vs key
    // "k" IS exchange-free and must not be rejected), but under
    // spark.sql.caseSensitive=true the same pair resolves as DISTINCT
    // columns and the join would silently shuffle — exactly what this
    // guard exists to reject
    val resolver = spark.sessionState.conf.resolver
    Seq(left -> ls, right -> rs).foreach { case (t, s) =>
      require(s.bucketColumnNames.length == 1 &&
          resolver(s.bucketColumnNames.head, key),
        s"table $t is bucketed on ${s.bucketColumnNames.mkString(",")}, " +
          s"not on join key $key — the join would silently shuffle")
    }
    spark.table(left).join(spark.table(right), key)
  }
}
