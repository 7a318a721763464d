package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("winnowing guarantee: shared substrings ≥ w+k−1 chars share a fingerprint") {
    val base = "the quick brown fox jumps over the lazy dog while spark shuffles data"
    val a = TextAnalysis.winnowFingerprints(base).toSet
    // same text → same set; prefix perturbation keeps most fingerprints
    assert(TextAnalysis.winnowFingerprints(base).toSet == a)
    val b = TextAnalysis.winnowFingerprints("XYZ " + base).toSet
    assert(a.intersect(b).nonEmpty, "long shared suffix must share fingerprints")
    val unrelated = TextAnalysis.winnowFingerprints(
      "completely different content with no overlap at all here").toSet
    assert(a.intersect(unrelated).isEmpty)
  }

  test("winnowing density: ≥ 1 fingerprint per window, short text degrades to whole-hash") {
    val t = "abcdefghijklmnopqrstuvwxyz"
    val fps = TextAnalysis.winnowFingerprints(t, k = 8, w = 4)
    assert(fps.nonEmpty && fps.length <= t.length - 8 + 1)
    assert(TextAnalysis.winnowFingerprints("ab").length == 1)
  }

  test("winnow query: fingerprint sharing histogram is well-formed") {
    val hist = TextAnalysis.winnowQuery(spark, sfDir).collect()
    assert(hist.nonEmpty)
    // (the synthetic corpus has a tiny shared vocabulary, so cross-doc
    // k-gram sharing is heavy — assert structure, not uniqueness)
    val m = hist.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.keySet.min >= 1L)
    assert(m.getOrElse(1L, 0L) > 0L, "some fingerprints must be unique")
    assert(m.values.sum > 100L)
  }

  test("zipf slope on the rich corpus: negative long-tail fit with high r2") {
    val row = TextAnalysis.zipfSlope(spark, sfDir).collect().head
    val (vocab, total) = (row.getLong(0), row.getLong(1))
    val (slope, r2, head) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(vocab > 1000L, s"rich corpus vocabulary must be wide, got $vocab")
    assert(total > vocab, "token mass exceeds type count")
    assert(slope < -0.8 && slope > -2.0,
      s"head-region rank/freq slope should be Zipf-like (~ -1), got $slope")
    assert(r2 > 0.85, s"the head fit must explain most variance, got $r2")
    assert(head > 0.2 && head < 1.0,
      s"a Zipfian head carries a large share of mass, got $head")
  }
}
