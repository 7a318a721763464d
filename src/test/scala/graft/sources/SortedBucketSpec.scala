package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Table SORT ORDER on bucketed snapshot tables: every data file holds
  * its rows ordered by the sort column, the read serves the order as
  * the BucketSpec's sort columns, and Spark grants the scan an
  * outputOrdering exactly when the planned file set has at most one
  * file per bucket — so a sort-merge join on the bucket column plans
  * with ZERO exchanges and ZERO sorts. Every plan assertion is paired
  * with a result-equality check against the plain computation: an
  * unsorted file behind the ordering claim would make the merge join
  * silently mis-pair rows, which is the failure mode these specs exist
  * to catch.
  */
class SortedBucketSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.SortExec
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

  private def walk(p: SparkPlan)(f: SparkPlan => Int): Int = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    f(p) + kids.map(walk(_)(f)).sum
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    walk(df.queryExecution.executedPlan) {
      case _: ShuffleExchangeLike => 1; case _ => 0
    }
  }

  private def sorts(df: DataFrame): Int = {
    df.collect()
    walk(df.queryExecution.executedPlan) {
      case _: SortExec => 1; case _ => 0
    }
  }

  private def ordersDf: DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .withColumn("grp", lit("all"))

  private def lineitemDf: DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .withColumn("grp", lit("all"))

  private def sortedPair(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("sortbkt")
    val t1 = base.resolve("orders").toString
    val t2 = base.resolve("lineitem").toString
    SnapshotTable.create(spark, t1, ordersDf, "grp",
      bucketBy = Some(("o_orderkey", 8)), sortBy = Some("o_orderkey"))
    SnapshotTable.create(spark, t2, lineitemDf, "grp",
      bucketBy = Some(("l_orderkey", 8)), sortBy = Some("l_orderkey"))
    (t1, t2)
  }

  private def joined(t1: String, t2: String): DataFrame =
    SnapshotTable.read(spark, t1)
      .join(SnapshotTable.read(spark, t2),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("l_extendedprice"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def noBroadcast[T](body: => T): T = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      // UNSET, not restore-to-saved: the adaptive conf was never set
      // before this block, and pinning it to the static threshold's
      // value breaks any later suite that lowers the static conf and
      // expects AQE to follow the fallback (observed: SnapshotTableSpec
      // readHinted order-dependent failure)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("SMJ on the bucket column of two sorted-bucketed tables plans " +
    "ZERO shuffles and ZERO sorts, and matches the plain join") {
    val (t1, t2) = sortedPair()
    noBroadcast {
      val fast = joined(t1, t2)
      assert(shuffles(fast) === 0)
      assert(sorts(fast) === 0)
      val slow = ordersDf.join(lineitemDf,
        col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("l_extendedprice"))
      assert(rows(fast) === rows(slow))
    }
  }

  test("an append that splits buckets across files DEGRADES the " +
    "ordering claim (sorts reappear), never the results; compact " +
    "restores one file per bucket and the sort-free plan") {
    val (t1, t2) = sortedPair()
    val extra = ordersDf.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    SnapshotTable.commitAppend(spark, t1, extra, "grp")
    noBroadcast {
      val degraded = joined(t1, t2)
      assert(shuffles(degraded) === 0,
        "co-partitioning must survive the append")
      assert(sorts(degraded) > 0,
        "multi-file buckets must drop the ordering claim")
      val slow = ordersDf.unionByName(extra)
        .join(lineitemDf, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("l_extendedprice"))
      assert(rows(degraded) === rows(slow))

      SnapshotTable.compact(spark, t1, "grp", smallThreshold = Long.MaxValue)
      val restored = joined(t1, t2)
      assert(shuffles(restored) === 0)
      assert(sorts(restored) === 0)
      assert(rows(restored) === rows(slow))
    }
  }

  test("every data file is internally ordered by the sort column, " +
    "after create, append, and merge-into") {
    val (t1, _) = sortedPair()
    SnapshotTable.commitAppend(spark, t1,
      ordersDf.withColumn("o_orderkey", col("o_orderkey") + lit(20000000L)),
      "grp")
    SnapshotTable.commitMergeInto(spark, t1,
      ordersDf.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      "o_orderkey", "grp")
    val v = SnapshotTable.currentVersion(spark, t1)
    val entries = SnapshotTable.readManifest(spark, t1, v)
    assert(entries.nonEmpty)
    entries.foreach { e =>
      val keys = spark.read.parquet(s"$t1/${e.path}")
        .select(col("o_orderkey")).collect().map(_.getLong(0)).toSeq
      assert(keys == keys.sorted,
        s"file ${e.path} is not ordered by the table sort column")
    }
  }

  test("sortBy without a bucket spec is refused; dropping the sort " +
    "column is refused; rename follows the sort spec") {
    val base = java.nio.file.Files.createTempDirectory("sortbkt_ref")
    val err = intercept[IllegalArgumentException] {
      SnapshotTable.create(spark, base.resolve("nobkt").toString,
        ordersDf, "grp", sortBy = Some("o_orderkey"))
    }
    assert(err.getMessage.contains("requires a bucket spec"))

    val (t1, t2) = sortedPair()
    val drop = intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, t1, "o_orderkey")
    }
    assert(drop.getMessage.contains("bucket column") ||
      drop.getMessage.contains("sort column"))

    SnapshotTable.renameColumn(spark, t1, "o_orderkey", "okey")
    noBroadcast {
      val fast = SnapshotTable.read(spark, t1).hint("merge")
        .join(SnapshotTable.read(spark, t2),
          col("okey") === col("l_orderkey"))
        .select(col("okey"), col("l_extendedprice"))
      assert(shuffles(fast) === 0,
        "the bucket claim must follow the renamed column")
      assert(sorts(fast) === 0,
        "the ordering claim must follow the renamed column")
      val slow = ordersDf.withColumnRenamed("o_orderkey", "okey")
        .join(lineitemDf, col("okey") === col("l_orderkey"))
        .select(col("okey"), col("l_extendedprice"))
      assert(rows(fast) === rows(slow))
    }
  }
}
