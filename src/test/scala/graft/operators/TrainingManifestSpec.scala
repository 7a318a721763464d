package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingManifestSpec extends SparkSpec {

  test("manifest reconciles: eval sides are never upsampled, train rows " +
    "respect the mix bounds, docs sum to the kept corpus minus dropped coins") {
    val m = TrainingManifest.manifest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(m.nonEmpty)
    for ((split, src, nDocs, nRows, nToks) <- m) {
      assert(nDocs > 0 && nRows > 0 && nToks > 0, s"$split/$src empty cell")
      if (split != "train") {
        assert(nRows === nDocs, s"$split/$src: evaluation data must never be mixed")
      } else {
        val w = 0.5 + src.stripPrefix("src").toInt * 0.25
        assert(nRows >= math.floor(w).toLong * nDocs &&
          nRows <= math.ceil(w).toLong * nDocs,
          s"train/$src: $nRows rows outside mix bounds for w=$w over $nDocs docs")
      }
    }
    // doc accounting: every kept NON-train doc appears; kept train docs
    // may only vanish by the w<1 fractional coin (w >= 1 sources keep all)
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = MinHashDedup.minhashQuery(spark, sfDir).select("a_id", "b_id")
    val dec = CuratedCorpus.decisionsFor(docs, pairs)
    val kept = docs.join(dec.filter(col("is_kept") === 1L).select("doc_id"), "doc_id")
    val keptBySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val manifestBySrc = m.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    for ((src, keptN) <- keptBySrc) {
      val w = 0.5 + src.stripPrefix("src").toInt * 0.25
      val got = manifestBySrc.getOrElse(src, 0L)
      if (w >= 1.0) assert(got === keptN,
        s"$src: with w>=1 every kept doc must reach the manifest")
      else assert(got <= keptN, s"$src: manifest can't exceed kept docs")
    }
  }
}
