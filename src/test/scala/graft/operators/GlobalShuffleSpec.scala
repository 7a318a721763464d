package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalShuffleSpec extends SparkSpec {

  test("assignment is a pure function of (seed, id): partitioning-independent, " +
    "dense positions, every doc exactly once") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = GlobalShuffle.shuffleAssignments(docs)
      .select("doc_id", "shard", "pos")
    val b = GlobalShuffle.shuffleAssignments(docs.repartition(13))
      .select("doc_id", "shard", "pos")
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
    assert(a.count() === docs.count())
    // dense 1..n per shard
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"),
        count_distinct(col("pos")).as("nd"))
    assert(perShard.filter(col("mn") =!= 1 || col("mx") =!= col("n") ||
      col("nd") =!= col("n")).count() === 0L)
  }

  test("a different seed is a genuinely different permutation; shards are balanced") {
    val docs = graft.Tables.documents(spark, sfDir)
    val e0 = GlobalShuffle.shuffleAssignments(docs, seed = "epoch0")
      .select("doc_id", "shard", "pos")
    val e1 = GlobalShuffle.shuffleAssignments(docs, seed = "epoch1")
      .select("doc_id", "shard", "pos")
    assert(e0.exceptAll(e1).count() > 0L, "epoch permutations must differ")
    val sizes = e0.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length === 8)
    val (mn, mx) = (sizes.min.toDouble, sizes.max.toDouble)
    assert(mx / mn < 2.0, s"md5 sharding should balance, got ${sizes.toSeq}")
  }

  test("shard sizing: derived count scales with the corpus; an explicit " +
    "nShards that would oversize a task's sort is refused") {
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    assert(GlobalShuffle.shardsFor(n, targetRowsPerShard = 10) ===
      ((n + 9) / 10).toInt)
    assert(GlobalShuffle.shardsFor(0) === 1)
    assert(GlobalShuffle.shardsFor(100L * 4000000L) === 100,
      "a 100x corpus gets 100x shards, never 100x shard size")
    val out = java.nio.file.Files.createTempDirectory("shards_sized").toString
    // derived: target 10 rows/shard -> ceil(n/10) shards on disk
    val derived = GlobalShuffle.writeShards(docs, out, targetRowsPerShard = 10)
    assert(derived === ((n + 9) / 10).toInt)
    val e = intercept[IllegalArgumentException] {
      GlobalShuffle.writeShards(docs, out, nShards = 1, targetRowsPerShard = 10)
    }
    assert(e.getMessage.contains("one task's sort"))
  }

  test("written shard files stream their permutation in order") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    GlobalShuffle.writeShards(docs, out, nShards = 4)
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // within each shard file, rows must already be in pos order
    val disordered = back.select(col("shard"), col("pos"),
      spark_partition_id().as("pid"),
      (monotonically_increasing_id()).as("file_order"))
      .withColumn("prev", lag(col("pos"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid"), col("shard")).orderBy(col("file_order"))))
      .filter(col("prev").isNotNull && col("pos") <= col("prev"))
    assert(disordered.count() === 0L,
      "shard files must be readable straight through in serving order")
  }
}
