package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMediaTable(spark, sfDir).cache()

  test("media table: binary payload + type label, payload round-trips text") {
    val row = media.filter(_.media_id == 0L).head()
    assert(new String(row.payload, "UTF-8").nonEmpty)
    assert(Set("image", "audio", "video").contains(row.media_type))
  }

  test("batched decode/featurize: 16-dim L1-normalized features, stable meta") {
    val feats = Multimodal.decodeAndFeaturize(media, batchSize = 7).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "L1 normalized")
      assert(f.meta.width >= 16 && f.meta.channels == 3)
      assert(f.meta.n_bytes > 0)
    }
    // determinism: same input ⇒ same features regardless of batch size
    val again = Multimodal.decodeAndFeaturize(media, batchSize = 64).collect()
    val byId = again.map(f => f.media_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(byId(f.media_id) == f.features.toSeq))
  }

  test("frame sampling covers the payload without overlap loss") {
    val payload = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.sampleFrames(payload, 4)
    assert(frames.length == 4)
    assert(frames.map(_.length).sum == 100)
    assert(Multimodal.sampleFrames(Array.emptyByteArray, 4).isEmpty)
  }
}
