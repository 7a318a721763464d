package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Approximate sketches (HLL error bound vs exact) and Spark's runtime
  * bloom-filter join pruning (the mechanism that stops a selective
  * fact⨝dim join from scanning non-matching fact rows at 100 TB).
  */
class ApproxAndRuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ApproxAndRuntimeFilterSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // force runtime bloom filters on regardless of size estimates
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // disable broadcast so the join is shuffle-based (bloom filters
      // target shuffle joins; broadcast joins don't need them)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("HLL approx_count_distinct within 5% of exact on real keys") {
    // driver-facing flags from the query itself
    val r = Relational.approxDistinct(spark, "/root/testdata/sf0.01").head()
    assert(r.getAs[Long]("orders_within_5pct") == 1L)
    assert(r.getAs[Long]("parts_within_5pct") == 1L)
    // and the raw sketch estimate directly (the query only exposes flags)
    val rr = graft.Tables.lineitem(spark, "/root/testdata/sf0.01").agg(
      approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
      count_distinct(col("l_orderkey")).as("e")).head()
    assert(math.abs(rr.getLong(0) - rr.getLong(1)).toDouble / rr.getLong(1) < 0.05,
      s"orders raw: ${rr.getLong(0)} vs ${rr.getLong(1)}")
  }

  test("selective dim join injects a runtime bloom filter on the fact side") {
    val dir = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "P") // selective build side
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilterMightContain") ||
      plan.contains("might_contain"), s"expected a runtime bloom filter:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum > 0)
  }
}
