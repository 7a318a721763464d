package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bigram-LM perplexity: hand-computed tiny-corpus check plus the
  * filter-property the operator exists for (repetitive text scores lower
  * perplexity than text made of one-off bigrams).
  */
class NgramLmSpec extends SparkSpec {

  test("tiny corpus matches hand-computed add-k bigram perplexity") {
    import spark.implicits._
    // corpus: "a b a b" and "a c"
    // tokens: a×3, b×2, c×1 → V = 3
    // bigrams: (a,b)×2, (b,a)×1, (a,c)×1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("lm_tiny")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val got = NgramLm.lmPerplexity(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val v = 3.0
    def p(c2: Long, c1: Long): Double = (c2 + 0.5) / (c1 + 0.5 * v)
    // doc 1 bigrams: (a,b) (b,a) (a,b); contexts c1(a)=3, c1(b)=2
    val d1 = Seq(p(2, 3), p(1, 2), p(2, 3)).map(math.log)
    val ppl1 = math.exp(-d1.sum / d1.size)
    // doc 2 bigrams: (a,c); context c1(a)=3
    val ppl2 = math.exp(-math.log(p(1, 3)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((3L, r6(ppl1))))
    assert(got(2L) === ((1L, r6(ppl2))))
  }

  test("repetitive text scores lower perplexity than one-off bigram soup") {
    import spark.implicits._
    val repeat = (1 to 40).map(_ => "the cat sat").mkString(" ")
    val soup = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, repeat), (2L, soup)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("lm_rank")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val ppl = NgramLm.lmPerplexity(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) < ppl(2L),
      s"repetitive doc must beat bigram soup, got $ppl")
  }

  test("driver query is deterministic and bounded at 20 rows") {
    val a = NgramLm.lmPerplexity(spark, sfDir).collect()
    val b = NgramLm.lmPerplexity(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 20)
    // ordered worst-first
    val ppls = a.map(_.getDouble(2)).toSeq
    assert(ppls === ppls.sorted(Ordering[Double].reverse))
  }
}
