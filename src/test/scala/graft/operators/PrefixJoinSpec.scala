package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PrefixJoinSpec extends SparkSpec {

  private def brute(dir: String): Set[(Long, Long, Double)] = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    val a = docs.select(col("doc_id").as("a_id"), col("ws").as("a_ws"))
    val b = docs.select(col("doc_id").as("b_id"), col("ws").as("b_ws"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("jac",
        round(size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
              size(array_union(col("a_ws"), col("b_ws"))).cast("double"), 6))
      .filter(col("jac") >= 0.8)
      .select("a_id", "b_id", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("prefix-filtered join equals the unblocked brute force") {
    val got = PrefixJoin.prefixJaccardOn(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === brute(sfDir))
    assert(got.nonEmpty, "fixture must contain qualifying pairs")
  }

  test("finds cross-block near-dups the (lang, source) blocked join cannot") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, text, "en", "srcA", text.length.toLong),
      (2L, text + " lambda", "fr", "srcB", (text.length + 7).toLong),
      (3L, "completely different words entirely here now", "en", "srcA", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("prefixjoin")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)

    val prefix = PrefixJoin.prefixJaccardOn(
        graft.Tables.documents(spark, tmp.toString))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix === Set((1L, 2L)), "global join must find the cross-block pair")

    val blocked = TextAnalysis.ngramJaccardPairs(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === Set.empty,
      "the (lang, source) blocked join cannot see across blocks — " +
        "the gap prefix filtering closes")
  }
}
