package graft

import graft.multimodal.MultimodalOps

/** Multimodal plumbing: schemas, batch shape, determinism. Decode is a
  * documented stub (no media libs in this container); the Spark-side
  * contract is what's under test. */
class MultimodalSpec extends SparkSpec {

  test("synthetic assets are deterministic and modality-partitioned") {
    val a = MultimodalOps.syntheticAssets(spark, 30).collect()
    val b = MultimodalOps.syntheticAssets(spark, 30).collect()
    assert(a.map(_.asset_id).toSeq == b.map(_.asset_id).toSeq)
    assert(a.zip(b).forall { case (x, y) => x.bytes.sameElements(y.bytes) })
    assert(a.map(_.modality).toSet == Set("image", "audio", "video"))
  }

  test("image features: fixed embedding dim, meta-driven dimensions") {
    val assets = MultimodalOps.syntheticAssets(spark, 30)
    val feats = MultimodalOps.imageFeatures(spark, assets).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.embedding.length == 16))
    assert(feats.forall(f => f.width == 128 && f.height == 96))
    // deterministic across runs
    val again = MultimodalOps.imageFeatures(spark,
      MultimodalOps.syntheticAssets(spark, 30)).collect()
    assert(feats.sortBy(_.asset_id).zip(again.sortBy(_.asset_id))
      .forall { case (x, y) => x.embedding.sameElements(y.embedding) })
  }

  test("audio features carry sample-rate metadata and 13 MFCC slots") {
    val feats = MultimodalOps.audioFeatures(spark,
      MultimodalOps.syntheticAssets(spark, 30)).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.mfcc.length == 13))
    assert(feats.forall(_.sample_rate == 22050))
  }

  test("video frame sampling emits every k-th fixed-size frame") {
    val frames = MultimodalOps.sampleVideoFrames(spark,
      MultimodalOps.syntheticAssets(spark, 30), every = 2, frameSize = 100)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_bytes.length <= 100))
    val perAsset = frames.groupBy(_.asset_id)
    perAsset.values.foreach { fs =>
      assert(fs.map(_.frame_index).sorted.toSeq ==
        (0 until fs.length).toSeq)
    }
  }
}
