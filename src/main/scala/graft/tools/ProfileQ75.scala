package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing of q75 (the Pass-Join edit-distance self-join;
  * r14: its sf1 ratio re-stamped 4-5.4 across windows — decompose
  * where the 10x time goes). Stages mirror
  * [[graft.operators.EditDistanceJoin.selfJoin]]'s plan boundaries by
  * driving the operator and its visible sub-plans.
  *
  *   SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 sbt "runMain graft.tools.ProfileQ75"
  */
object ProfileQ75 {
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
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val d = graft.queries.Round8.editDistMax
    val headChars = graft.queries.Round8.editHeadChars
    val docs = graft.Tables.parallel(spark, dir, "documents")
      .filter(col("n_chars") >= headChars)
      .select(col("doc_id"), substring(col("text"), 1, headChars).as("head"))
    time("head scan")(docs.count())

    // the operator's two explode sides, reproduced at the API level:
    // segment side = (d+1) segments/string; window side = the Lemma-3
    // interval codes (the heavy CPU lambda)
    val parts = d + 1
    val base = docs.select(col("doc_id").as("__id"), col("head").as("__s"))
      .filter(col("__s").isNotNull && length(col("__s")) > d)
      .withColumn("__len", length(col("__s")))
    val k = floor(col("__len") / parts).cast("int")
    val r0 = (col("__len") % parts).cast("int")
    val segs = base.select(col("__id"),
      explode(transform(sequence(lit(0), lit(d)), i => {
        val start = (i * k + least(i, r0) + lit(1)).cast("int")
        val slen = (k + when(i < r0, 1).otherwise(0)).cast("int")
        struct(i.cast("int").as("i"), slen.as("l"), start.as("p"),
          xxhash64(col("__s").substr(start, slen)).as("h"))
      })).as("e"))
    println(s"[prof] segment rows: ${time("segs explode")(segs.count())}")
    val winCodes = array_distinct(flatten(flatten(
      transform(
        filter(sequence(col("__len") - d, col("__len") + d), la => la > d),
        la => {
          val kA = floor(la / parts).cast("int")
          val rA = (la % parts).cast("int")
          val delta = (col("__len") - la).cast("int")
          transform(sequence(lit(0), lit(d)), i => {
            val pc = (i * kA + least(i, rA) + lit(1)).cast("int")
            val l = (kA + when(i < rA, 1).otherwise(0)).cast("int")
            val ii = i.cast("int")
            val lo = greatest(
              pc + greatest(-ii, delta - (lit(d) - ii)), lit(1))
            val hi = least(
              pc + least(ii, delta + (lit(d) - ii)),
              col("__len") - l + 1)
            transform(
              filter(sequence(lo, greatest(hi, lo)), p => p <= hi),
              p => i.cast("long") * lit(1L << 48) +
                l.cast("long") * lit(1L << 24) + p.cast("long"))
          })
        }))))
    val wins = base.select(col("__id"), explode(winCodes).as("__c"))
    println(s"[prof] window rows: ${time("wins explode")(wins.count())}")

    // candidate volumes around the r14 packed-histogram join filter:
    // joined rows pre/post, distinct pairs pre/post — the filter's
    // value at scale is shuffle-volume reduction, which local wall
    // time may not show
    locally {
      val ph = graft.functions.ColumnBridge.col(
        graft.functions.PackedHist(
          graft.functions.ColumnBridge.expr(col("__s"))))
      val baseP = base.withColumn("__ph", ph)
      val segsF = baseP.select(col("__id"), col("__len"), col("__ph"),
        explode(transform(sequence(lit(0), lit(d)), i => {
          val start = (i * k + least(i, r0) + lit(1)).cast("int")
          val slen = (k + when(i < r0, 1).otherwise(0)).cast("int")
          struct(i.cast("int").as("i"), slen.as("l"), start.as("p"),
            xxhash64(col("__s").substr(start, slen)).as("h"))
        })).as("e"))
        .select(col("__id").as("id_a"), col("__len").as("len_a"),
          col("__ph").as("ph_a"), col("e.i").as("i"), col("e.l").as("l"),
          col("e.p").as("p_a"), col("e.h").as("h"))
      val code = col("__c")
      val winsF = baseP.select(col("__id"), col("__len"), col("__s"),
          col("__ph"), explode(winCodes).as("__c"))
        .select(col("__id").as("id_b"), col("__len").as("len_b"),
          col("__ph").as("ph_b"),
          shiftright(code, 48).cast("int").as("i"),
          shiftright(code, 24).bitwiseAND(lit((1L << 24) - 1))
            .cast("int").as("l"),
          code.bitwiseAND(lit((1L << 24) - 1)).cast("int").as("p_b"),
          xxhash64(col("__s").substr(
            code.bitwiseAND(lit((1L << 24) - 1)).cast("int"),
            shiftright(code, 24).bitwiseAND(lit((1L << 24) - 1))
              .cast("int"))).as("h"))
      val joined = segsF.join(winsF, Seq("h", "i", "l"))
        .filter(col("id_a") < col("id_b") &&
          abs(col("len_a") - col("len_b")) <= d &&
          abs(col("p_b") - col("p_a")) <= col("i") &&
          abs(col("p_b") - col("p_a") - (col("len_b") - col("len_a"))) <=
            lit(d) - col("i"))
      val phOk = graft.functions.ColumnBridge.col(
        graft.functions.PackedHistL1(
          graft.functions.ColumnBridge.expr(col("ph_a")),
          graft.functions.ColumnBridge.expr(col("ph_b")))) <= 2 * d
      println(s"[prof] joined candidate rows: ${joined.count()}; " +
        s"post packed-hist filter: ${joined.filter(phOk).count()}")
      println(s"[prof] distinct candidate pairs: " +
        s"${joined.select("id_a", "id_b").distinct().count()}; " +
        s"post filter: " +
        s"${joined.filter(phOk).select("id_a", "id_b").distinct().count()}")
    }

    val pairs = graft.operators.EditDistanceJoin
      .selfJoin(docs, "doc_id", "head", d)
    println(s"[prof] result pairs: ${time("FULL selfJoin")(pairs.count())}")
    time("FULL q75 (query+orderBy)")(
      graft.SparkEntry.queries("q75_edit_dist_join")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
