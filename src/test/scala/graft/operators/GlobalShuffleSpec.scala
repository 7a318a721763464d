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
