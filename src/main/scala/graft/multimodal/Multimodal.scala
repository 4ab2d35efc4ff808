package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.crawl.ImageCodec

/** Multimodal column handling: images/audio/video ride as opaque `binary`
  * columns with typed metadata, processed in batch-shaped partition-local
  * stages — the Scala analogue of `mapInPandas` batches (typed
  * `mapPartitions` over case-class rows; one decode context per
  * partition, streaming through rows without materializing the group).
  *
  * Real media codecs aren't in this container, so decode is the
  * deterministic [[ImageCodec]] STUB — the Spark-side contract (schema,
  * batch shape, partition-locality, null-safe error channel) is the real,
  * tested surface, and swapping the stub for libjpeg/ffmpeg is a pure
  * kernel replacement.
  */
object Multimodal {

  case class ImageRow(image_id: String, bytes: Array[Byte])

  case class ImageFeatures(
      image_id: String,
      ok: Boolean,
      w: Int,
      h: Int,
      fmt: String,
      mean_luma: Double,
      std_luma: Double,
      edge_energy: Double,
      phash: Long)

  case class Thumbnail(image_id: String, tw: Int, th: Int, thumb: Array[Byte])

  /** Luma/edge feature kernel over already-decoded pixels — shared by
    * [[extractFeatures]] AND the fetch pipeline (Fetch.fetch), which
    * computes these at fetch time from the decode it already paid for, so
    * the stored table carries the features and the read side (c11) never
    * re-decodes (the single-decode discipline the text side has with
    * q46's tokenize-once). Returns (mean_luma, std_luma, edge_energy),
    * each floor-rounded to 2 decimals. */
  def lumaEdgeStats(px: Array[Byte], w: Int, h: Int): (Double, Double, Double) = {
    var sum = 0.0; var sq = 0.0
    var i = 0
    while (i < px.length) {
      val v = (px(i) & 0xff).toDouble
      sum += v; sq += v * v; i += 1
    }
    val n = px.length.toDouble
    val mean = sum / n
    val variance = math.max(0.0, sq / n - mean * mean)
    // horizontal gradient energy (cheap edge signal)
    var eg = 0.0
    var y = 0
    while (y < h) {
      var x = 1
      while (x < w) {
        val d = ((px(y * w + x) & 0xff) - (px(y * w + x - 1) & 0xff)).toDouble
        eg += d * d
        x += 1
      }
      y += 1
    }
    (math.floor(mean * 100) / 100,
      math.floor(math.sqrt(variance) * 100) / 100,
      math.floor(eg / n * 100) / 100)
  }

  /** Decode + feature-extract, one codec context per partition. Decode
    * failures land as ok=false rows (error channel, not exceptions). */
  def extractFeatures(images: Dataset[ImageRow]): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        ImageCodec.decode(r.bytes) match {
          case Some((w, h, fmt, px)) =>
            val (mean, std, edge) = lumaEdgeStats(px, w, h)
            ImageFeatures(r.image_id, ok = true, w, h, fmt,
              mean, std, edge, ImageCodec.phash(px, w, h))
          case None =>
            ImageFeatures(r.image_id, ok = false, 0, 0, "undecodable", 0, 0, 0, 0L)
        }
      }
    }
  }

  /** Nearest-neighbor resize to (tw × th), re-encoded lossless. */
  def resize(images: Dataset[ImageRow], tw: Int, th: Int): Dataset[Thumbnail] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.flatMap { r =>
        ImageCodec.decode(r.bytes).map { case (w, h, _, px) =>
          val out = new Array[Byte](tw * th)
          var y = 0
          while (y < th) {
            val sy = y * h / th
            var x = 0
            while (x < tw) {
              out(y * tw + x) = px(sy * w + x * w / tw)
              x += 1
            }
            y += 1
          }
          Thumbnail(r.image_id, tw, th, ImageCodec.encode(out, tw, th, "png"))
        }
      }
    }
  }

  /** Frame sampling for an opaque "video" byte stream: treat the payload
    * as fixed-size frames and keep every `stride`-th one (STUB for the
    * ffmpeg frame extractor; partitioning/batching contract is real). */
  def sampleFrames(videos: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val slicer = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length < frameBytes) Seq.empty[Array[Byte]]
      else (0 until bytes.length / frameBytes by stride)
        .map(i => java.util.Arrays.copyOfRange(bytes, i * frameBytes, (i + 1) * frameBytes))
    }
    videos.withColumn("frames", slicer(col("bytes")))
      .withColumn("n_frames", size(col("frames")))
  }
}
