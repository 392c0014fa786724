package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.image.ImageCodec

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata, exactly like the crawl engine's
 * image+caption output table (input_hint schema). Operators:
 *
 *  - [[decodeMeta]] — decode + feature-extract: (w, h, n_px, mean_px, phash)
 *    from the engine's own deterministic raster codec ([[ImageCodec]] —
 *    REAL decode, not a stub; the container has no external image libs, so
 *    the codec is the same one the crawl validator uses for PSNR).
 *  - [[resize]] — nearest-neighbour resize, re-encoded lossless.
 *  - [[frameSample]] — video-style frame sampling over a concatenated-frame
 *    binary layout (every k-th frame).
 *  - [[StubCodecs]] — the boundary where real JPEG/MP3/H.264 decoders would
 *    plug in; deterministic fakes, clearly marked.
 *
 * Spark-side design notes (what matters at 100 TB): binary payloads are
 * NEVER grouped or shuffled by value — all operators are per-row
 * projections (UDF over binary), so the scan stays embarrassingly parallel
 * and column pruning drops `bytes` whenever only metadata is selected.
 * Batch-vectorized decode (mapInPandas / mapInArrow) is the drop-in upgrade
 * once native codecs exist; the schema contract below is already
 * batch-shaped (one struct column out per binary column in).
 */
object Multimodal {

  /** Decoded-image features; `ok=false` rows carry nulls (corrupt payload). */
  val decodeMeta = udf((bytes: Array[Byte]) => {
    if (bytes == null) None
    else try {
      val (w, h, px) = ImageCodec.decode(bytes)
      var sum = 0L
      var i = 0
      while (i < px.length) { sum += (px(i) & 0xff); i += 1 }
      val mean = if (px.length == 0) 0.0 else sum.toDouble / px.length
      Some((w, h, px.length.toLong, math.round(mean * 10000).toDouble / 10000,
        ImageCodec.phashOf(px, w, h)))
    } catch { case _: Exception => None }
  })

  /** Nearest-neighbour resize to (w2, h2), re-encoded with the lossless codec. */
  val resize = udf((bytes: Array[Byte], w2: Int, h2: Int) => {
    if (bytes == null || w2 <= 0 || h2 <= 0) null
    else try {
      val (w, h, px) = ImageCodec.decode(bytes)
      val out = new Array[Byte](w2 * h2 * 3)
      var y = 0
      while (y < h2) {
        val sy = y * h / h2
        var x = 0
        while (x < w2) {
          val src = (sy * w + (x * w / w2)) * 3
          val dst = (y * w2 + x) * 3
          out(dst) = px(src); out(dst + 1) = px(src + 1); out(dst + 2) = px(src + 2)
          x += 1
        }
        y += 1
      }
      ImageCodec.encodeRaster(out, w2, h2)
    } catch { case _: Exception => null }
  })

  /**
   * Frame sampling for video-shaped payloads: the binary is `n` equal-size
   * frames back to back; keep every `step`-th frame. Returns the sampled
   * frames as an array of binaries (explode for per-frame rows).
   */
  val frameSample = udf((bytes: Array[Byte], frameSize: Int, step: Int) => {
    if (bytes == null || frameSize <= 0 || step <= 0) Seq.empty[Array[Byte]]
    else (0 until bytes.length / frameSize by step)
      .map(i => bytes.slice(i * frameSize, (i + 1) * frameSize))
  })

  /**
   * STUBS — external-codec boundary. The container ships no image/audio
   * libraries, so these produce deterministic fakes with the right shape;
   * swapping in javax.imageio / ffmpeg bindings changes ONLY these bodies.
   */
  object StubCodecs {
    /** STUB: pretend-JPEG decode — deterministic fake raster from the byte hash. */
    val decodeJpegStub = udf((bytes: Array[Byte]) => {
      if (bytes == null) null
      else {
        val seed = bytes.foldLeft(0L)((a, b) => ImageCodec.mix64(a ^ (b & 0xffL)))
        ImageCodec.raster(java.lang.Long.toHexString(seed), 8, 8)
      }
    })

    /** STUB: pretend-audio features (duration, rms) from byte stats. */
    val audioFeaturesStub = udf((bytes: Array[Byte], sampleRate: Int) => {
      if (bytes == null || sampleRate <= 0) None
      else {
        val dur = bytes.length.toDouble / sampleRate
        var acc = 0.0
        bytes.foreach(b => acc += (b & 0xff) * (b & 0xff))
        val rms = if (bytes.isEmpty) 0.0 else math.sqrt(acc / bytes.length)
        Some((math.round(dur * 1000).toDouble / 1000, math.round(rms * 100).toDouble / 100))
      }
    })
  }

  /** Attach decoded features to a frame with a binary `bytes` column. */
  def withImageFeatures(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("img", decodeMeta(col(bytesCol)))
      .withColumn("img_w", col("img._1"))
      .withColumn("img_h", col("img._2"))
      .withColumn("img_px", col("img._3"))
      .withColumn("img_mean", col("img._4"))
      .withColumn("img_phash", col("img._5"))
      .drop("img")
}
