package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.AnnSearch

/** Partitioned-at-rest layout: reads must prune partitions (the scan's
  * PartitionFilters), which is the mechanism that turns shard/bucket
  * queries into O(shard) instead of O(corpus) at 100 TB.
  */
class TableIOSpec extends SparkSpec {

  test("index write partitioned by shard; shard reads prune partitions") {
    val dir = Files.createTempDirectory("graft_index").toString
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("hospital", expr("vec_id % 3"))
    TableIO.writeIndex(emb, dir)

    val back = TableIO.readIndex(spark, dir)
    assert(back.count() == emb.count())

    val pruned = back.filter(col("hospital") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(hospital"),
      s"shard filter must prune partitions:\n$plan")
    assert(pruned.count() ==
      emb.filter(col("hospital") === 1).count())
  }

  test("ANN index: LSH bucket partitioning makes probes partition-pruned scans") {
    val dir = Files.createTempDirectory("graft_ann").toString
    val planes = AnnSearch.hyperplanes(4, 64)
    val emb = AnnSearch.withLshBucket(
      Tables.embeddings(spark, sfDir), "embedding", planes)
    TableIO.writeAnnIndex(emb, dir, "lsh_bucket")

    val back = TableIO.readIndex(spark, dir)
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .head().getSeq[Float](1).toArray
    val probes = AnnSearch.probeBuckets(q, planes)
    val probed = back.filter(col("lsh_bucket").isin(probes: _*))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:"), plan)
    assert(plan.contains("lsh_bucket"), plan)
    // probing must touch fewer rows than the corpus
    assert(probed.count() < back.count())
  }
}
