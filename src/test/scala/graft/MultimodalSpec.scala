package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, per-partition decode stub,
  * frame sampling shape. */
class MultimodalSpec extends SparkSuite {

  test("asMedia → decodeMeta roundtrip") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((1L, "hello world"), (2L, "x" * 250)).toDF("id", "txt")
    val meta = Multimodal.decodeMeta(Multimodal.asMedia(df, "id", "txt", "audio"))
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).size_bytes === 11L)
    assert(meta(1L).kind === "audio")
    assert(meta(1L).width === 11 && meta(1L).height === 11)
    assert(meta(1L).n_frames === 1)
    assert(meta(2L).size_bytes === 250L)
    assert(meta(2L).n_frames === 3)
    assert(meta(2L).first_frame_offset === 50L)
  }

  test("sampleFrames slices byte ranges deterministically") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((7L, "abcdefghij")).toDF("id", "txt") // 10 bytes
    val frames = Multimodal.sampleFrames(
        Multimodal.asMedia(df, "id", "txt", "video"), everyN = 2, frameSize = 3)
      .orderBy("frame_idx").collect()
    // 10/3 = 3 frames at idx 0,1,2 → sampled every 2nd → idx 0, 2
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(new String(frames(0).getAs[Array[Byte]](2), "UTF-8") === "abc")
    assert(new String(frames(1).getAs[Array[Byte]](2), "UTF-8") === "ghi")
  }
}
