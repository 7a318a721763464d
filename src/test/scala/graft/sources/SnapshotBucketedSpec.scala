package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed snapshot tables: the BucketSpec-served read must (a) elide
  * the shuffle for joins/aggs on the bucket column and (b) still be
  * CORRECT — a wrong bucket id in a file name would make the
  * shuffle-free join silently drop matches, so every plan assertion
  * here is paired with a result-equality check against the plain
  * (exchange-planning) computation.
  */
class SnapshotBucketedSpec extends SparkSpec {

  private def shuffles(df: DataFrame): Int = {
    df.collect() // finalize the adaptive plan first
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // AQE wraps materialized exchanges in LEAF QueryStageExec nodes —
    // a plain collect() never reaches the ShuffleExchange inside, so
    // descend through every wrapper explicitly
    def count(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case other                    => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def ordersDf: DataFrame =
    Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"), col("o_orderpriority"))

  private def customerDf: DataFrame =
    Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"),
      col("c_mktsegment"))

  private def bucketedPair(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("snapbkt")
    val t1 = base.resolve("orders").toString
    val t2 = base.resolve("customer").toString
    SnapshotTable.create(spark, t1, ordersDf, "o_orderpriority",
      bucketBy = Some(("o_custkey", 8)))
    SnapshotTable.create(spark, t2, customerDf, "c_mktsegment",
      bucketBy = Some(("c_custkey", 8)))
    (t1, t2)
  }

  private def joined(t1: String, t2: String): DataFrame =
    SnapshotTable.read(spark, t1)
      .join(SnapshotTable.read(spark, t2),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))

  test("join on the bucket column plans with ZERO shuffles and matches " +
    "the plain exchange-planning join exactly") {
    val (t1, t2) = bucketedPair()
    // broadcast off: at test SF the dim side would broadcast and BOTH
    // plans would be shuffle-free for the wrong reason — the claim
    // under test is that BUCKETING alone co-partitions the SMJ
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val fast = joined(t1, t2)
      // the plain computation: same inputs, no bucket metadata
      val slow = ordersDf.join(customerDf, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      assert(shuffles(fast) === 0)
      assert(shuffles(slow) > 0)
      assert(sortedRows(fast) === sortedRows(slow))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("aggregation on the bucket column needs no exchange; results are " +
    "exact") {
    val (t1, _) = bucketedPair()
    val agg = SnapshotTable.read(spark, t1).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    assert(shuffles(agg) === 0)
    val plain = ordersDf.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    assert(sortedRows(agg) === sortedRows(plain))
  }

  test("every file's rows hash to the bucket id in its name") {
    val (t1, _) = bucketedPair()
    val bad = SnapshotTable.read(spark, t1)
      .withColumn("__f",
        element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn("__claimed",
        regexp_extract(col("__f"), "_(\\d+)\\.parquet$", 1).cast("int"))
      .filter(pmod(hash(col("o_custkey")), lit(8)) =!= col("__claimed"))
      .count()
    assert(bad === 0L)
  }

  test("append and merge preserve the bucket layout: the join stays " +
    "shuffle-free and sees the new rows") {
    import spark.implicits._
    val (t1, t2) = bucketedPair()
    val maxKey = ordersDf.agg(max(col("o_orderkey"))).head().getLong(0)
    val extraOrders = customerDf.limit(3).select(
      (col("c_custkey") + maxKey).as("o_orderkey"), // unique fresh keys
      col("c_custkey").as("o_custkey"),
      lit(55.5).as("o_totalprice"),
      lit("1-URGENT").as("o_orderpriority"))
    SnapshotTable.commitAppend(spark, t1, extraOrders, "o_orderpriority")
    SnapshotTable.commitMerge(spark, t1,
      ordersDf.filter(col("o_orderkey") % 501 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 9.0),
      "o_orderkey", "o_orderpriority")

    val fast = joined(t1, t2)
    val replayOrders = ordersDf
      .unionByName(extraOrders)
      .join(ordersDf.filter(col("o_orderkey") % 501 === 0)
        .select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(ordersDf.filter(col("o_orderkey") % 501 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 9.0))
    val slow = replayOrders.join(customerDf,
      col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try assert(shuffles(fast) === 0)
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    assert(sortedRows(fast) === sortedRows(slow))
  }

  test("rival layouts and schema hazards are refused loudly") {
    val (t1, _) = bucketedPair()
    val z = intercept[IllegalArgumentException] {
      SnapshotTable.clusterZOrder(spark, t1, "o_orderpriority",
        "o_orderkey", "o_custkey")
    }
    assert(z.getMessage.contains("mutually exclusive"))
    val d = intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, t1, "o_custkey")
    }
    assert(d.getMessage.contains("bucket column"))
    // rename FOLLOWS the spec (ids hash values, not names): still
    // shuffle-free on the new name
    SnapshotTable.renameColumn(spark, t1, "o_custkey", "cust")
    val agg = SnapshotTable.read(spark, t1).groupBy(col("cust"))
      .agg(count(lit(1)).as("n"))
    assert(shuffles(agg) === 0)
  }
}
