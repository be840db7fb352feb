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
      f // warm-up (no unpersist here: later stages read earlier pins)
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

    val hashed0 = media.select(col("media_id").cast("long").as("id"),
      VideoDedup.frameHashes(col("payload")).as("__fhs"))
    time("decode (frameHashes, no pin)")(noop(hashed0))
    // the UNPINNED gram plan the r14 fix removed: Catalyst collapses
    // the decode projection into the gram expression's ~4 __fhs
    // references, re-running the GIF decode per reference (measured
    // r14 at sf1: 6.6 s vs 0.93 s for one decode pass) — kept here as
    // the regression probe for the pin
    val q = 2
    val elems = (1 to q).map(k => s"element_at(__fhs, i + $k)")
    val gramsExpr = s"CASE WHEN size(__fhs) >= $q THEN " +
      s"transform(sequence(0, size(__fhs) - $q), i -> " +
      s"xxhash64(${elems.mkString(", ")})) " +
      "ELSE CAST(array() AS ARRAY<BIGINT>) END"
    def grams(src: org.apache.spark.sql.DataFrame) = src
      .select(col("id"), array_distinct(expr(gramsExpr)).as("__gs"))
      .select(col("id"), size(col("__gs")).as("ng"),
        explode(col("__gs")).as("g"))
    time("grams UNPINNED (dup decode)")(noop(grams(hashed0)))
    val hashed = time("decode localCheckpoint pin")(hashed0.localCheckpoint())
    val sets = grams(hashed)
    time("grams explode (from pin)")(noop(sets))
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
