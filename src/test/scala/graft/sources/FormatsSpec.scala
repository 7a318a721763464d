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
}
