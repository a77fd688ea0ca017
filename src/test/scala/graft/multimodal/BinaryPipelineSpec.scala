package graft.multimodal

import graft.SparkTestBase
import graft.images.ImageCodec

class BinaryPipelineSpec extends SparkTestBase {

  test("batched feature extraction: every kind handled, batches bounded") {
    val media = BinaryPipeline.synthMedia(spark, 500)
    val feats = BinaryPipeline.extractFeatures(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.batch_size <= BinaryPipeline.BatchSize))
    val byKind = feats.groupBy(_.kind)
    assert(byKind.keySet == Set("image", "audio", "video"))
    assert(byKind("image").forall(f => f.feat_w == 32 && f.n_frames == 1 && f.sniffed == "png"))
    assert(byKind("audio").forall(f => f.n_frames == f.n_bytes / 2 && f.sniffed == "pcm-stub"))
    assert(byKind("video").forall(f => f.n_frames == 5 && f.feat_w == 640))
  }

  test("feature extraction is deterministic across reruns") {
    val a = BinaryPipeline.extractFeatures(BinaryPipeline.synthMedia(spark, 200))
      .collect().sortBy(_.media_id).map(_.toString).toSeq
    val b = BinaryPipeline.extractFeatures(BinaryPipeline.synthMedia(spark, 200))
      .collect().sortBy(_.media_id).map(_.toString).toSeq
    assert(a == b)
  }

  test("resize produces decodable images at target dims") {
    val media = BinaryPipeline.synthMedia(spark, 60)
    val out = BinaryPipeline.resizeImages(media, 8, 8).collect()
    assert(out.nonEmpty)
    out.foreach { case (_, bytes) =>
      val Some((px, w, h)) = ImageCodec.decode(bytes)
      assert(w == 8 && h == 8 && px.length == 64)
    }
  }
}
