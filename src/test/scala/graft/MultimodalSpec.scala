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

  test("resize decimates payload toward the target area") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((1L, "x" * 100)).toDF("id", "txt")
    val out = Multimodal.resize(
        Multimodal.asMedia(df, "id", "txt", "image"), targetW = 5, targetH = 5)
      .collect().head
    assert(out.payload.length === 25) // 100 bytes / ratio 4
    assert(out.media_id === 1L && out.kind === "image")
  }

  test("extractFeatures: normalized fixed-width embedding, ANN-compatible") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq((1L, "aabb"), (2L, "aabb"), (3L, "zzzz")).toDF("id", "txt")
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "id", "txt", "image"), dims = 8)
    assert(feats.schema("embedding").dataType.simpleString === "array<float>")
    val rows = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(rows(1L).sum - 1f) < 1e-6) // histogram normalized
    assert(rows(1L) === rows(2L))              // deterministic
    assert(rows(1L) !== rows(3L))
    // flows into the ANN operator unchanged
    val top = graft.operators.Ann.bruteForceTopK(
      feats, feats.filter(col("media_id") === 1L), "media_id", "embedding", 1)
    assert(top.head().getLong(2) === 2L) // duplicate payload is rank 1
  }
}
