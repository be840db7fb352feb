package graft

import graft.operators.Chunker

/** Pins [[Chunker.slidingChunks]] window geometry: overlap content,
  * tail-drop threshold, and the only-chunk exemption for short docs. */
class ChunkerSpec extends SparkSuite {

  private def chunksOf(text: String, window: Int, stride: Int, minTail: Int) = {
    import spark.implicits._
    Chunker.slidingChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        window, stride, minTail)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk", "n_tokens")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      .toSeq
  }

  test("overlapping windows repeat stride-to-window tokens") {
    val words = (1 to 12).map(i => s"w$i")
    val got = chunksOf(words.mkString(" "), window = 5, stride = 3, minTail = 2)
    assert(got === Seq(
      (0, "w1 w2 w3 w4 w5", 5),
      (1, "w4 w5 w6 w7 w8", 5),   // 2-token overlap with chunk 0
      (2, "w7 w8 w9 w10 w11", 5),
      (3, "w10 w11 w12", 3)))     // tail of 3 >= minTail 2, kept + clamped
  }

  test("tails shorter than minTail are dropped") {
    // 11 tokens, stride 5: starts 1,6,11; the start-11 tail has 1 token < 3
    val words = (1 to 11).map(i => s"w$i")
    val got = chunksOf(words.mkString(" "), window = 5, stride = 5, minTail = 3)
    assert(got.map(_._1) === Seq(0, 1))
    assert(got.last === (1, "w6 w7 w8 w9 w10", 5))
  }

  test("a document shorter than minTail still yields its only chunk") {
    assert(chunksOf("solo", window = 50, stride = 40, minTail = 10) ===
      Seq((0, "solo", 1)))
  }

  test("null text rows are dropped, not crashed on (oracle parity)") {
    import spark.implicits._
    val got = Chunker.slidingChunks(
        Seq((1L, "a b c"), (2L, null)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("minTail past stride+1 is rejected (would drop interior chunks)") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    // past window: full interior windows would vanish
    val e = intercept[IllegalArgumentException] {
      Chunker.slidingChunks(df, "doc_id", "text",
        window = 50, stride = 50, minTail = 60)
    }
    assert(e.getMessage.contains("interior"))
    // in (stride+1, window]: a run of short clamped chunks would vanish,
    // not just the single trailing fragment — also rejected
    val e2 = intercept[IllegalArgumentException] {
      Chunker.slidingChunks(df, "doc_id", "text",
        window = 50, stride = 10, minTail = 20)
    }
    assert(e2.getMessage.contains("interior"))
  }

  test("plan is shuffle-free (narrow explode only)") {
    import spark.implicits._
    val plan = Chunker.slidingChunks(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
