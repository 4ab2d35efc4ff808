package graft

import org.apache.spark.sql.functions._
import graft.crawl.ImageCodec
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.ImageRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def images(n: Int) = spark.range(n).map { i =>
    val w = 16 + (i % 8).toInt; val h = 12 + (i % 5).toInt
    val px = ImageCodec.pixels(i * 7919L, w, h)
    ImageRow(s"img$i", ImageCodec.encode(px, w, h, if (i % 2 == 0) "png" else "jpg"))
  }

  test("feature extraction: decodes, stats in range, deterministic") {
    val feats = Multimodal.extractFeatures(images(50)).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.ok))
    feats.foreach { f =>
      assert(f.mean_luma >= 0 && f.mean_luma <= 255)
      assert(f.std_luma >= 0 && f.std_luma <= 128)
    }
    val again = Multimodal.extractFeatures(images(50)).collect()
    assert(feats.map(_.phash).toSeq == again.map(_.phash).toSeq)
  }

  test("feature extraction: corrupt bytes land on the error channel, not exceptions") {
    val rows = images(5).collect().toSeq :+ ImageRow("bad", Array[Byte](1, 2, 3)) :+
      ImageRow("nul", null)
    val feats = Multimodal.extractFeatures(spark.createDataset(rows)).collect()
    assert(feats.count(!_.ok) == 2)
    assert(feats.filter(!_.ok).forall(_.fmt == "undecodable"))
  }

  test("resize: output decodes to requested dims, lossless") {
    val thumbs = Multimodal.resize(images(20), 8, 8).collect()
    assert(thumbs.length == 20)
    thumbs.foreach { t =>
      val Some((w, h, fmt, px)) = ImageCodec.decode(t.thumb)
      assert(w == 8 && h == 8 && fmt == "png" && px.length == 64)
    }
  }

  test("frame sampling: every stride-th fixed-size frame") {
    val vid = Seq(("v1", Array.tabulate[Byte](100)(_.toByte))).toDF("video_id", "bytes")
    val out = Multimodal.sampleFrames(vid, frameBytes = 10, stride = 3)
    val row = out.select($"n_frames", element_at($"frames", 1)).head()
    assert(row.getInt(0) == 4) // frames 0,3,6,9 of 10
    assert(row.getAs[Array[Byte]](1).toSeq == (0 until 10).map(_.toByte))
  }
}
