package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSuite {

  test("synthesize: every doc becomes a typed media record with binary payload") {
    val ds = Multimodal.synthesize(graft.core.Tables.documents(spark, sfDir))
    val rows = ds.collect()
    assert(rows.length === 500)
    assert(rows.forall(r => Set("image", "audio", "video").contains(r.media_type)))
    assert(rows.forall(_.payload.nonEmpty))
  }

  test("extractFeatures: batched decode stub produces bounded dimensions") {
    val ds = Multimodal.synthesize(graft.core.Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(ds, batchSize = 32).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.width >= 64 && f.width < 64 + 512)
      assert(f.height >= 64 && f.height < 64 + 512)
      assert(f.channels >= 1 && f.channels <= 4)
      assert(f.embedding.length === 8)
      assert(f.byte_len > 0)
    }
  }

  test("decode stub is deterministic (same bytes → same dims)") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b) === Multimodal.decodeStub(b.clone()))
  }

  test("frame sampler slices every k-th 64-byte frame") {
    val payload = Array.fill[Byte](64 * 10)(7)
    val frames = Multimodal.frameSampleStub(payload, 3)
    assert(frames.length === 4) // indices 0,3,6,9
    assert(frames.forall(_.length == 64))
  }

  test("multimodal_stats query aggregates per media type") {
    val rows = Multimodal.multimodalStats(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === Set("image", "audio", "video"))
    assert(rows.map(_.getLong(1)).sum === 500)
  }
}
