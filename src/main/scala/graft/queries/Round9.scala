package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ImageDedup, Multimodal}

/** Round-9 queries: content-level image near-duplicate detection — the
  * pixel-level companion to q26's container-header plumbing. */
object Round9 {

  /** q102 plant geometry: base images are 18×16 px (2×2-px cells on the
    * 9×8 dHash grid), scaled copies 36×32 (4×4 cells) — grid-aligned,
    * so box-average downscale reproduces the identical cell grid and
    * the planted transforms land at Hamming distance EXACTLY 0. */
  val imgW = 18
  val imgH = 16

  /** Per-(doc, cell) gray value in [1, 200]: pseudo-random via
    * splitmix64 so distinct docs get independent gradient-sign
    * patterns (expected cross-doc Hamming ≈ 32 ≫ the ≤3 cut), and
    * capped at 200 so the +16 brightness plant never clamps. */
  private[queries] def cellValue(id: Long, cell: Int): Int = {
    var z = id * 72L + cell + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    1 + java.lang.Math.floorMod(z, 200L).toInt
  }

  /** q102: content-level image near-dup via perceptual dHash over
    * DECODED 24-bit BMP pixels + exact Hamming-band blocking
    * ([[graft.operators.ImageDedup]]). Four payload populations per
    * doc_id: the base image; a 2× pixel-replication upscale (+1M ids);
    * a +16 uniform brightness shift (+2M ids) — both transforms leave
    * the dHash bit-identical BY CONSTRUCTION (gradient signs survive
    * scaling and uniform shifts), so the expected pair set is exactly
    * the three in-trio pairs per doc at hamming 0, which the oracle
    * re-derives arithmetically from doc_id with no read-back; plus the
    * doc's text lifted into opaque binary (+3M ids) — no pixel path,
    * hash NULL, and the operator must SKIP it, not throw or pair it.
    * A decode/endianness/row-order bug, a hash bit error, a broken
    * band, or an undecodable payload leaking into the join all change
    * the pair set and fail the gate. Cross-doc false pairs are
    * excluded by the ≤3 Hamming cut on ~32-expected-bit-distance
    * independent patterns. */
  def q102ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.parallel(s, dir, "documents")
    val media = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        def px(scale: Int, shift: Int)(x: Int, y: Int): Int =
          cellValue(id, (y / (2 * scale)) * 9 + x / (2 * scale)) + shift
        Seq(
          Multimodal.MediaRecord(id, "image",
            ImageDedup.ImageBuild.bmp24Gray(imgW, imgH)(px(1, 0))),
          Multimodal.MediaRecord(id + 1000000L, "image",
            ImageDedup.ImageBuild.bmp24Gray(2 * imgW, 2 * imgH)(px(2, 0))),
          Multimodal.MediaRecord(id + 2000000L, "image",
            ImageDedup.ImageBuild.bmp24Gray(imgW, imgH)(px(1, 16))),
          Multimodal.MediaRecord(id + 3000000L, "image",
            text.getBytes("UTF-8")))
      }
      .toDF("media_id", "kind", "payload")
    ImageDedup.nearDupPairs(media, "media_id", "payload",
        maxHamming = 3, bands = 4)
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_image_neardup" -> q102ImageNearDup _)

  val oracles: Map[String, String] = Map(
    "q102_image_neardup" ->
      """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents)
        |SELECT id AS id_a, id + 1000000 AS id_b,
        |  CAST(0 AS INTEGER) AS hamming FROM t
        |UNION ALL
        |SELECT id, id + 2000000, CAST(0 AS INTEGER) FROM t
        |UNION ALL
        |SELECT id + 1000000, id + 2000000, CAST(0 AS INTEGER) FROM t
        |ORDER BY id_a, id_b""".stripMargin)
}
