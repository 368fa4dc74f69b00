package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a small fake image payload"),
    (2L, "another, longer fake payload with more bytes in it"))
    .toDF("doc_id", "text")

  private lazy val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")

  test("binary payload + metadata extraction is deterministic") {
    val meta = Multimodal.extractMeta(media)
    val m1 = meta.orderBy("media_id").collect()
    val m2 = Multimodal.extractMeta(media).orderBy("media_id").collect()
    assert(m1.toSeq == m2.toSeq)
    assert(m1(0).getAs[Long]("n_bytes") == "a small fake image payload".length)
    assert(m1(0).getAs[Int]("width") >= 1 && m1(0).getAs[Int]("width") <= 1920)
    assert(m1(0).getAs[String]("sha").length == 64)
  }

  test("feature extraction: fixed-dim float vectors via mapPartitions") {
    val feats = Multimodal.extractFeatures(media, dims = 16).collect()
    assert(feats.length == 2)
    assert(feats.forall(_.features.length == 16))
    // deterministic per payload
    val again = Multimodal.extractFeatures(media, dims = 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("resize stub scales down only, preserving aspect bound") {
    val resized = Multimodal.resizeMeta(Multimodal.extractMeta(media), maxSide = 64)
    resized.collect().foreach { r =>
      assert(r.getAs[Int]("resized_width") <= 64 || r.getAs[Int]("resized_height") <= 64)
      assert(r.getAs[Int]("resized_width") <= r.getAs[Int]("width"))
    }
  }

  test("frame sampling explodes every k-th frame index") {
    val frames = Multimodal.sampleFrames(Multimodal.extractMeta(media), everyK = 10)
    val byId = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"), max("frame_idx").as("maxIdx"), max("n_frames").as("nf"))
    byId.collect().foreach { r =>
      val expected = (r.getAs[Int]("nf") + 9) / 10
      assert(r.getAs[Long]("n") == expected)
      assert(r.getAs[Int]("maxIdx") < r.getAs[Int]("nf"))
    }
  }
}
