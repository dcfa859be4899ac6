package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media table carries the typed metadata schema") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf))
    assert(media.columns.toSeq ==
      Multimodal.mediaSchema.fields.map(_.name).toSeq)
    assert(media.count() == 500)
  }

  test("per-partition feature extraction is deterministic and total") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == 500)
    val f0 = feats.filter(_.media_id == 0L).collect().head
    val again = Multimodal.extractFeatures(spark, media)
      .filter(_.media_id == 0L).collect().head
    assert(f0.feature.toSeq == again.feature.toSeq)
    assert(f0.n_bytes > 0 && f0.feature.length == 4)
  }

  test("frame sampling chunks payloads at fixed stride") {
    val media = Multimodal.syntheticMedia(
      Tables.documents(spark, sf)).filter($"media_id" < 5)
    val frames = Multimodal.sampleFrames(spark, media, stride = 32)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_payload"))
    assert(frames.count() > media.count()) // docs are >32 bytes
  }
}
