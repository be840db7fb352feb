package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Empirical probe for the r14 duplicated-expensive-expression hazard:
  * a projection that aliases a non-cheap fused expression (gram
  * hashing, media decode) and is then consumed by BOTH a projected
  * scalar (`size(alias)`) and a generator (`explode(alias)`) can end
  * up re-evaluating the expensive expression once per reference —
  * this is exactly what made q113's ordered-video gate re-run the GIF
  * decode ~6x (PLANS.md r14 notes). The text-gram self-joins
  * (JaccardJoin, ContainmentJoin) build the same shape over
  * SortedGramHashes; this tool times each operator's REAL sub-plan
  * against a single-reference control so the hazard is measured, not
  * assumed from optimizer-rule reading.
  *
  *   SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 sbt "runMain graft.tools.DupExprAudit"
  */
object DupExprAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      f // warm-up
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[audit] $label%-42s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.parallel(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val grams = ColumnBridge.col(graft.functions.SortedGramHashes(
      ColumnBridge.expr(col("text")), 3))
    val g = docs.select(col("doc_id").as("__id"), grams.as("__g"))

    // control: ONE reference to the alias (explode only)
    time("gram pass, 1 ref (explode only)")(noop(
      g.select(col("__id"), explode(col("__g")).as("__gram"))))
    // JaccardJoin/ContainmentJoin index shape: null-guard + explode = 2 refs
    time("index shape, 2 refs (when+explode)")(noop(
      g.select(col("__id"),
        explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))))
    // probe/buckets shape: size + null-guard + explode = 3 refs
    time("probe shape, 3 refs (size+when+explode)")(noop(
      g.select(col("__id"), size(col("__g")).cast("long").as("__n"),
        explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))))
    // the q113 r13 shape for reference: scalar-of-alias + explode over
    // a SECOND derived alias
    val derived = g.select(col("__id"),
      array_distinct(col("__g")).as("__gs"))
    time("derived shape (distinct alias + size + explode)")(noop(
      derived.select(col("__id"), size(col("__gs")).as("ng"),
        explode(col("__gs")).as("g"))))

    spark.stop()
  }
}
