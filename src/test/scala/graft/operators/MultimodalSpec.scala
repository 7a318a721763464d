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

  test("frame → embedding → top-k chain matches a driver-side brute force") {
    val got = Multimodal.frameEmbeddingSearch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 10)
    val sims = got.map(_._3)
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })

    // brute-force replication with the same stubs
    val all = media.filter(_.media_type == "video").collect().flatMap { r =>
      Multimodal.sampleFrames(r.payload, 4).zipWithIndex.map { case (f, i) =>
        (r.media_id, i.toLong, Multimodal.featurize(f))
      }
    }
    val probe = all.find(t => t._1 == 2L && t._2 == 0L).get._3
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = all.filter(t => !(t._1 == 2L && t._2 == 0L))
      .map(t => (t._1, t._2,
        BigDecimal(cos(t._3, probe)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(t => (-t._3, t._1, t._2)).take(10).map(t => (t._1, t._2))
    assert(got.map(t => (t._1, t._2)).toSeq == expected.toSeq)
  }
}
