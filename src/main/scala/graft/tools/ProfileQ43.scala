package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Stage-by-stage timing of q43's PPJoin pipeline at SPARK_GRAFT_SF_DIR.
  * Each stage is timed on a FRESHLY built DataFrame (no shuffle reuse)
  * to match what a cold query pays; the full-query stage runs the
  * SHIPPED operator (graft.operators.JaccardJoin), not a re-derivation,
  * so the profile can't drift from production behavior. */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = {
      val d = graft.Tables.parallel(spark, dir, "documents")
      d.select(col("doc_id"), col("text"))
        .unionByName(d.filter(col("n_chars") >= 100).select(
          (col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
    }
    def time(name: String)(f: => Long): Unit = {
      f // warm (jit/codegen); fresh DataFrames each call => no shuffle reuse
      val ts = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $name%-30s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }
    val t = 0.8 - 1e-9

    def g = docs.select(col("doc_id").as("__id"),
      ColumnBridge.col(graft.functions.SortedGramHashes(
        ColumnBridge.expr(col("text")), 3)).as("__g"))

    def stopRows() = g
      .select(explode(when(col("__g").isNotNull, col("__g"))).as("__gram"))
      .groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
      .orderBy(col("__df").desc, col("__gram"))
      .limit(1 << 16)
      .collect()
    time("a: stop-gram collect")(stopRows().length)

    val byKey = stopRows().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val stopBc = graft.functions.RarestPrefix.broadcastTable(spark, byKey)
    def prefix = ColumnBridge.col(graft.functions.RarestPrefix(
      ColumnBridge.expr(col("__g")), t, stopBc))
    def buckets = g.select(
      col("__id"), size(col("__g")).cast("long").as("__n"),
      explode(when(col("__g").isNotNull, prefix)).as("__bucket"))
    time("b: buckets (prefix explode)")(buckets.count())

    def cands = buckets
      .groupBy(col("__bucket"))
      .agg(collect_list(struct(col("__id"), col("__n"))).as("__members"))
      .filter(size(col("__members")) > 1)
      .select(ColumnBridge.col(graft.functions.LengthFilteredPairs(
        ColumnBridge.expr(col("__members")), t)).as(Seq("id_a", "id_b")))
      .distinct()
    time("c: cands (+agg+pairs+distinct)")(cands.count())

    // the shipped operator end to end (includes the stop-gram job)
    time("d: full operator")(
      graft.operators.JaccardJoin
        .nearDupPairs(docs, "doc_id", "text", k = 3, minJaccard = 0.8)
        .count())

    // micro: per-eval cost of the fused verify on representative texts
    {
      val rnd = new scala.util.Random(1)
      val words = Array.fill(400)("w" + rnd.nextInt(200))
      def mk() = Array.fill(54)(words(rnd.nextInt(words.length))).mkString(" ")
      val ta = org.apache.spark.unsafe.types.UTF8String.fromString(mk())
      val tb = org.apache.spark.unsafe.types.UTF8String.fromString(mk())
      val ex = graft.functions.ShingleJaccard(
        org.apache.spark.sql.catalyst.expressions.Literal(ta,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.catalyst.expressions.Literal(tb,
          org.apache.spark.sql.types.StringType), 3)
      var i = 0
      var acc = 0.0
      while (i < 20000) { acc += ex.nullSafeEval(ta, tb).asInstanceOf[Double]; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < 200000) { acc += ex.nullSafeEval(ta, tb).asInstanceOf[Double]; i += 1 }
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[prof] e: ShingleJaccard micro: ${el / 200000 * 1e6}%8.2f us/eval (acc=$acc%.1f)")
    }

    // wall-clock attribution: stage spans + per-stage task counts for one
    // cold run of the shipped operator (catches serialized-verify
    // regressions: the verify stage must run wide, not as one task)
    {
      val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
      val taskAgg = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          spans.add((si.stageId,
            si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L)))
        }
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          taskAgg.merge(te.stageId, (1, d, d), (a, b) =>
            (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.operators.JaccardJoin
        .nearDupPairs(docs, "doc_id", "text", k = 3, minJaccard = 0.8)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[prof] f: cold noop write wall=$wall%.2f s; stages:")
      import scala.jdk.CollectionConverters._
      val ss = spans.asScala.toSeq.sortBy(_._2)
      val base = ss.headOption.map(_._2).getOrElse(0L)
      ss.foreach { case (id, sub, comp) =>
        val (nt, sum, mx) = Option(taskAgg.get(id)).getOrElse((0, 0L, 0L))
        println(f"[prof]   stage $id%3d +${(sub - base) / 1000.0}%6.2f -> +${(comp - base) / 1000.0}%6.2f (${(comp - sub) / 1000.0}%5.2f s) tasks=$nt sumTask=${sum / 1000.0}%.2f maxTask=${mx / 1000.0}%.2f")
      }
    }
    spark.stop()
  }
}
