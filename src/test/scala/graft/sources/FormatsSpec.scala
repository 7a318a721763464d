package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Source/sink breadth beyond parquet: CSV and JSON round-trips with
  * explicit schemas (`spark.read/write` are the engine's connector
  * surface; schema-on-read keeps them scale-safe — no inference scans).
  */
class FormatsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)
    .select("doc_id", "lang", "n_chars")

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
  }

  test("json round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("orc round-trip") {
    val dir = Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("partitioned csv write prunes on read like parquet") {
    val dir = Files.createTempDirectory("graft_csv_part").toString
    docs.write.mode("overwrite").partitionBy("lang")
      .option("header", "true").csv(dir)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(dir)
      .filter(col("lang") === "en")
    assert(back.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(back.count() == docs.filter(col("lang") === "en").count())
  }

  test("schema evolution: mergeSchema unifies an appended column, old " +
    "rows read null") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    docs.filter(col("doc_id") < 100).write.parquet(s"$dir/p=1")
    docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .withColumn("quality", col("n_chars").cast("double") / 500.0)
      .write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("quality"))
    assert(merged.count() == docs.filter(col("doc_id") < 200).count())
    assert(merged.filter(col("p") === 1 && col("quality").isNotNull).count() == 0,
      "pre-evolution rows surface the new column as null")
    assert(merged.filter(col("p") === 2 && col("quality").isNull).count() == 0)
  }

  test("bucketed tables co-locate the join: bucketBy on the key removes " +
    "the shuffle entirely") {
    // bucketBy requires the table catalog (saveAsTable); both sides
    // bucketed+sorted on the join key ⇒ SortMergeJoin with ZERO Exchange —
    // the at-rest co-location the brief's 100 TB join story relies on
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_b_lineitem")

    val joined = spark.table("graft_b_lineitem")
      .join(spark.table("graft_b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    // disable broadcast so the co-location (not a broadcast) is what
    // removes the exchanges
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges == 0, s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and the result matches the unbucketed join
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      assert(joined.exceptAll(expect).count() == 0)
      assert(expect.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }
}
