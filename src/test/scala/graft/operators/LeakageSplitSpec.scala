package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("no near-dup pair ever crosses a split boundary, and every doc " +
    "is assigned exactly once") {
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = MinHashDedup.minhashQuery(spark, sfDir).select("a_id", "b_id")
    val assign = LeakageSplit.splitAssignments(docs, pairs).cache()

    // total coverage, no duplicates
    assert(assign.count() === docs.count())
    assert(assign.select("doc_id").distinct().count() === docs.count())

    // the guard itself: both endpoints of every verified near-dup pair
    // carry the same split label
    val crossing = pairs
      .join(assign.select(col("doc_id").as("a_id"), col("split").as("sa")), "a_id")
      .join(assign.select(col("doc_id").as("b_id"), col("split").as("sb")), "b_id")
      .filter(col("sa") =!= col("sb"))
    assert(crossing.count() === 0L,
      "a near-dup pair split across train/eval is exactly the leak this op exists to prevent")

    // contrast: the naive per-doc hash split DOES cross (the bug this
    // operator fixes) — if the corpus has any near-dup pair whose two ids
    // hash to different buckets, which the md5 avalanche makes near-certain
    val naive = docs.select(col("doc_id"))
      .withColumn("bucket",
        (conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % 100))
      .withColumn("split", when(col("bucket") < 10, "test")
        .when(col("bucket") < 20, "validation").otherwise("train"))
    val naiveCrossing = pairs
      .join(naive.select(col("doc_id").as("a_id"), col("split").as("sa")), "a_id")
      .join(naive.select(col("doc_id").as("b_id"), col("split").as("sb")), "b_id")
      .filter(col("sa") =!= col("sb"))
    if (pairs.count() >= 10) {
      assert(naiveCrossing.count() > 0L,
        "sanity: the per-doc split must actually exhibit the leak on this corpus")
    }
    assign.unpersist()
  }

  test("cluster members all inherit the representative's split") {
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = MinHashDedup.minhashQuery(spark, sfDir).select("a_id", "b_id")
    val assign = LeakageSplit.splitAssignments(docs, pairs)
    val mismatched = assign.alias("m")
      .join(assign.select(col("doc_id").as("rep"), col("split").as("rep_split"))
        .alias("r"), Seq("rep"))
      .filter(col("split") =!= col("rep_split"))
    assert(mismatched.count() === 0L)
  }

  test("split report reconciles with the corpus and realizes ~10/10/80") {
    val rows = LeakageSplit.leakageSplitQuery(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(rows.values.map(_._1).sum === total)
    // group counts are per-split disjoint (a group lives on one side only)
    val groups = rows.values.map(_._2).sum
    val distinctReps = LeakageSplit.splitAssignments(
      graft.Tables.documents(spark, sfDir),
      MinHashDedup.minhashQuery(spark, sfDir).select("a_id", "b_id"))
      .select("rep").distinct().count()
    assert(groups === distinctReps)
    // md5 buckets are uniform enough that each side is populated at this SF
    assert(rows.keySet === Set("train", "validation", "test"))
    assert(rows("train")._1 > rows("test")._1)
  }
}
