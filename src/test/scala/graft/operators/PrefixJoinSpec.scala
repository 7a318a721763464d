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

  test("rich corpus: candidate pairs ≪ n(n−1)/2 — prefix filtering is " +
    "SELECTIVE, not just exact") {
    val rich = Tables.richDocuments(spark, sfDir)
    val n = rich.count()
    val allPairs = n * (n - 1) / 2
    val nCands = PrefixJoin.candidatePairs(PrefixJoin.tokenSets(rich)).count()
    // the 31-token corpus puts ~100% of pairs in the candidate set; the
    // wide-vocab corpus must bound candidates by the planted group
    // structure + rare-token collisions — well under 10% of all pairs
    assert(nCands * 10 < allPairs,
      s"candidates $nCands not ≪ $allPairs (n=$n)")
    // and the candidates still contain every qualifying pair (exactness
    // on the rich corpus, against the unblocked brute force)
    val docs = PrefixJoin.tokenSets(rich)
    val a = docs.select(col("doc_id").as("a_id"), col("ws").as("a_ws"))
    val b = docs.select(col("doc_id").as("b_id"), col("ws").as("b_ws"))
    val bruteRich = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("jac",
        round(size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
              size(array_union(col("a_ws"), col("b_ws"))).cast("double"), 6))
      .filter(col("jac") >= 0.8)
      .select("a_id", "b_id", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = PrefixJoin.prefixJaccardOn(rich)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === bruteRich)
    assert(got.size > 100, "rich fixture must plant a meaningful pair count")
  }

  test("rich corpus is deterministic and group-structured") {
    val rich = Tables.richDocuments(spark, sfDir).orderBy("doc_id")
    val again = Tables.richDocuments(spark, sfDir).orderBy("doc_id")
    assert(rich.collect().toSeq === again.collect().toSeq,
      "derivation must be pure in doc_id")
    val vocab = rich.select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct("w")).head().getLong(0)
    assert(vocab > 1000, s"wide vocabulary expected, got $vocab distinct tokens")
    // same-group docs share length (length is seeded on gid)
    val lens = rich.select((col("doc_id").divide(4)).cast("long").as("gid"),
        size(split(col("text"), " ")).as("m"))
      .groupBy("gid").agg(countDistinct("m").as("d")).agg(max("d")).head().getLong(0)
    assert(lens === 1L, "doc length must be group-constant")
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
