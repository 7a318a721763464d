package graft.operators

import graft.SparkSpec

class CuratedCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val goodText = "the quick brown fox jumps over lazy dog today"

  test("decisionsFor: independent reason bits compose, including all three at once") {
    // 1 kept; 2 exact-dup of 1; 3 quality-fail; (4,5,6) a near-dup cluster
    // where 6 is ALSO an exact dup of 3 and quality-fails — bits 1|2|4
    val docs = Seq(
      (1L, goodText),
      (2L, goodText),
      (3L, "x"),
      (4L, goodText + " tonight"),
      (5L, goodText + " tomorrow"),
      (6L, "x")).toDF("doc_id", "text")
    val pairs = Seq((4L, 5L), (4L, 6L)).toDF("a_id", "b_id")
    val got = CuratedCorpus.decisionsFor(docs, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (0L, 1L), 2L -> (1L, 0L), 3L -> (4L, 0L),
      4L -> (0L, 1L), 5L -> (2L, 0L), 6L -> (7L, 0L)))
  }

  test("q_curated_corpus: one decision per corpus doc, kept + dropped = total") {
    val docs = graft.Tables.documents(spark, sfDir)
    val rows = CuratedCorpus.curatedQuery(spark, sfDir).collect()
    assert(rows.length == docs.count(), "exactly one decision row per doc")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val kept = rows.count(_.getLong(2) == 1L)
    val dropped = rows.count(r => r.getLong(1) != 0L)
    assert(kept + dropped == rows.length)
    // is_kept is exactly reason_bits == 0
    assert(rows.forall(r => (r.getLong(1) == 0L) == (r.getLong(2) == 1L)))
  }
}
