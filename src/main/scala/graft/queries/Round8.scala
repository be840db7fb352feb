package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 operators: edit-distance similarity join, map-valued
  * aggregate combinators, adaptive histograms and the moment-statistics
  * battery. Same conventions as the other families: shared literals
  * between the Spark side and the oracle SQL, every query totally
  * ordered, int outputs cast BIGINT on both sides. */
object Round8 {

  /** q75's threshold: planted near-dup doc pairs sit at head edit
    * distance <= 4 while unrelated word-salad pairs start at ~37
    * (measured at sf0.01) — 8 keeps a wide margin on both sides. */
  val editDistMax = 8
  val editHeadChars = 80

  /** q75: exact edit-distance self-join over fixed-length document
    * heads ([[graft.operators.EditDistanceJoin]], Pass-Join pigeonhole
    * blocking) — the character-level near-dup detector that catches
    * small in-place edits Jaccard shingles over-penalize. Candidates
    * come from a complete segment/window hash join; only candidate
    * pairs run the banded Levenshtein. The oracle is the brute-force
    * all-pairs scan (fine at sf0.01; the operator exists precisely so
    * the corpus never pays that quadratic cost). */
  def q75EditDistJoin(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(s, dir, "documents")
      .filter(col("n_chars") >= editHeadChars)
      .select(col("doc_id"),
        substring(col("text"), 1, editHeadChars).as("head"))
    graft.operators.EditDistanceJoin
      .selfJoin(docs, "doc_id", "head", editDistMax)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_edit_dist_join" -> q75EditDistJoin _)

  val oracles: Map[String, String] = Map(
    "q75_edit_dist_join" ->
      s"""WITH d AS (SELECT doc_id, substr(text, 1, $editHeadChars) AS head
        |           FROM documents WHERE n_chars >= $editHeadChars)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= $editDistMax
        |ORDER BY doc_a, doc_b""".stripMargin)
}
