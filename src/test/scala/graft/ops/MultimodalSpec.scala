package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdefgh" * 8),   // 64 bytes
    (1L, "xy"),
    (2L, "0123456789abcdef")).toDF("doc_id", "text")

  test("attachMedia: opaque binary + typed metadata, deterministic type") {
    val m = Multimodal.attachMedia(docs).orderBy("doc_id").collect()
    m.map(_.getAs[String]("media_type")) shouldBe Array("image", "audio", "video")
    m(0).getAs[Int]("n_bytes") shouldBe 64
    m(0).getAs[Array[Byte]]("media").length shouldBe 64
  }

  test("extractFeatures: one decoder pass per partition, typed output") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .collect().sortBy(_.doc_id)
    feats.length shouldBe 3
    feats(0).features.length shouldBe 8
    // deterministic stub: same payload -> same features
    val again = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .collect().sortBy(_.doc_id)
    feats(0).features.toSeq shouldBe again(0).features.toSeq
    feats(0).n_frames shouldBe 1
  }

  test("frameSample slices payload into n frames covering all bytes") {
    val frames = Multimodal.frameSample(Multimodal.attachMedia(docs), 4)
      .filter($"doc_id" === 0)
      .orderBy("frame_idx").collect()
    frames.length shouldBe 4
    val total = frames.map(_.getAs[Array[Byte]]("frame").length).sum
    total shouldBe 64
    // tiny payload still yields at least one non-empty frame
    Multimodal.frameSample(Multimodal.attachMedia(docs), 4)
      .filter($"doc_id" === 1).count() should be >= 1L
  }
}
