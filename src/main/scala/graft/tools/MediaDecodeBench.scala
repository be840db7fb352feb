package graft.tools

import graft.operators.{AudioDedup, ImageDedup, JpegBuild, VideoDedup}
import graft.operators.ImageDedup.{ImageBuild, ImagePixels}

/** Single-thread decode-throughput probe for the media family — the
  * map-side CPU that dominates the content near-dup queries at crawl
  * scale (the shuffles move only (id, 8-byte sig) rows, so per-core
  * decode rate IS the scaling constant). Run with larger images than
  * the oracle plants to measure the decoders, not the dispatch:
  *
  *   java -cp ... graft.tools.MediaDecodeBench [sidePx] [reps]
  *
  * Prints one line per format: payload bytes, decodes/s, MB/s. */
object MediaDecodeBench {
  def main(args: Array[String]): Unit = {
    val side = if (args.nonEmpty) args(0).toInt else 256
    val reps = if (args.length > 1) args(1).toInt else 200
    val rnd = new scala.util.Random(11)
    val img = Array.fill(side, side)(rnd.nextInt(256))
    def px(x: Int, y: Int): Int = img(y)(x)

    val payloads: Seq[(String, Array[Byte])] = Seq(
      "bmp24" -> ImageBuild.bmp24Gray(side, side)(px),
      "png_gray8" -> ImageBuild.pngGray(side, side)(px),
      "png_rgb8" -> ImageBuild.pngGray(side, side, colorType = 2)(px),
      "gif_1frame" -> VideoDedup.GifBuild.animatedGray(side, side,
        Seq(px _)),
      "jpeg_base_unit" -> JpegBuild.gray(side, side)(px),
      "jpeg_base_lossy" -> JpegBuild.gray(side, side,
        quant = JpegBuild.LossyQuant)(px),
      "jpeg_prog_lossy" -> JpegBuild.grayProgressive(side, side,
        quant = JpegBuild.LossyQuant)(px),
      "wav_pcm16" -> AudioDedup.WavBuild.pcm16(
        Array.fill(side * side / 2)(rnd.nextInt(65536) - 32768)))

    def decode(name: String, p: Array[Byte]): Unit = name match {
      case n if n.startsWith("gif") =>
        require(VideoDedup.GifPixels.avgHashOf(p).nonEmpty)
      case n if n.startsWith("wav") =>
        require(AudioDedup.WavPcm.hashOf(p).nonEmpty)
      case _ => require(ImagePixels.dhashOf(p).nonEmpty)
    }

    payloads.foreach { case (name, p) =>
      (1 to math.max(reps / 10, 3)).foreach(_ => decode(name, p)) // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => decode(name, p))
      val dt = (System.nanoTime() - t0) / 1e9
      val perSec = reps / dt
      val mbs = reps.toDouble * p.length / dt / 1e6
      println(f"[mediabench] $name%-16s ${p.length}%9d B  " +
        f"$perSec%8.1f dec/s  $mbs%8.1f MB/s")
    }
  }
}
