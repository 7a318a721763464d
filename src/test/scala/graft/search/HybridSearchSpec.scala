package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 + RRF fusion: hand-computed scores on a tiny corpus, the fusion
  * arithmetic invariant, and the top-k plan shape.
  */
class HybridSearchSpec extends SparkSpec {

  test("bm25 matches hand-computed Okapi scores on a 3-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "merge sort"),
      (1L, "merge merge data"),
      (2L, "data table")).toDF("doc_id", "text")

    val got = HybridSearch.bm25Scored(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // N=3, avgdl=7/3; df(merge)=2, df(sort)=1, df(stream)=0
    val n = 3.0; val avgdl = 7.0 / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // doc 2 has no query term — filtered out
    assert(got.keySet === Set(0L, 1L))
    assert(got(0L) === r6(w(1, 2, 2) + w(1, 1, 2)))        // merge + sort
    assert(got(1L) === r6(w(2, 2, 3)))                      // merge only
  }

  test("every bm25 hit contains at least one query term") {
    val hits = HybridSearch.bm25TopDocs(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir), "doc_id")
    assert(hits.count() > 0)
    val bad = hits.filter(!HybridSearch.Terms
      .map(t => array_contains(split(col("text"), " "), t))
      .reduce(_ || _))
    assert(bad.count() === 0)
  }

  test("rrf score is exactly 1/(60+lex)+1/(60+vec) on doubly-ranked docs") {
    val rows = HybridSearch.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val both = rows.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    assert(both.nonEmpty, "expected at least one doc in both rank lists")
    for (r <- both) {
      val want = BigDecimal(
        1.0 / (60.0 + r.getLong(2)) + 1.0 / (60.0 + r.getLong(3)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(1) === want, s"doc ${r.getLong(0)}")
    }
    // fused scores arrive ranked
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("proximity search reports the minimum token gap within the window") {
    val rows = HybridSearch.proximitySearch(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir), "doc_id")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val toks = r.getAs[String]("text").split(" ")
      val p1 = toks.indices.filter(toks(_) == "merge")
      val p2 = toks.indices.filter(toks(_) == "sort")
      val gaps = for (a <- p1; b <- p2) yield math.abs(a - b)
      assert(r.getAs[Long]("min_gap") === gaps.min.toLong)
      assert(gaps.min <= 3)
      assert(r.getAs[Long]("n_merge") === p1.size.toLong)
      assert(r.getAs[Long]("n_sort") === p2.size.toLong)
    }
  }

  test("bm25 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = HybridSearch.bm25TopDocs(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
