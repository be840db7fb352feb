package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.VideoDedup

/** Stage-level timing of q113 (the solo ordered-video gate — worst
  * BENCH_SF1 ratio in r13 at 4.33; r13 judge directive #2): plant
  * scan → frame-hash decode → gram explode → localCheckpoint pin →
  * hot-bucket census → gram self-join+agg → orderBy, each stage
  * noop-written (or counted) after a warm-up pass. The gram stages
  * mirror `VideoDedup.orderedPairsFrom` exactly (same SQL strings) so
  * the decomposition times the operator's real plan shapes.
  *
  *   SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 sbt "runMain graft.tools.ProfileQ113"
  */
object ProfileQ113 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      f // warm-up
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val media = graft.queries.Round13.q113Plant(spark, dir)
    time("plant scan (cache read)")(media.count())

    val hashed = media.select(col("media_id").cast("long").as("id"),
      VideoDedup.frameHashes(col("payload")).as("__fhs"))
    time("decode (frameHashes)")(noop(hashed))

    // gram stages: VideoDedup.orderedPairsFrom's exact expressions (q=2)
    val q = 2
    val elems = (1 to q).map(k => s"element_at(__fhs, i + $k)")
    val gramsExpr = s"CASE WHEN size(__fhs) >= $q THEN " +
      s"transform(sequence(0, size(__fhs) - $q), i -> " +
      s"xxhash64(${elems.mkString(", ")})) " +
      "ELSE CAST(array() AS ARRAY<BIGINT>) END"
    val sets0 = hashed
      .select(col("id"), array_distinct(expr(gramsExpr)).as("__gs"))
      .select(col("id"), size(col("__gs")).as("ng"),
        explode(col("__gs")).as("g"))
    time("grams explode (no pin)")(noop(sets0))
    val sets = time("localCheckpoint pin")(sets0.localCheckpoint())
    time("census logTopBuckets")(
      graft.functions.SkewWarn.logTopBuckets(sets, "g", "ProfileQ113"))
    val a = sets.select(col("id").as("id_a"), col("ng").as("na"), col("g"))
    val b = sets.select(col("id").as("id_b"), col("ng").as("nb"), col("g"))
    val joined = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    time("gram join+agg (from pin)")(noop(joined))
    time("+ orderBy (query tail)")(noop(joined.orderBy("id_a", "id_b")))

    time("FULL operator (pin incl.)")(noop(
      VideoDedup.orderedNearDupPairs(media, "media_id", "payload",
        q = 2, minJaccard = 0.5)))
    time("FULL q113 (operator+orderBy)")(noop(
      graft.queries.Round13.q113VideoOrderedSolo(spark, dir)))

    spark.stop()
  }
}
