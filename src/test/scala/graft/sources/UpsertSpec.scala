package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class UpsertSpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("ups").resolve("t").toString
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.partitionBy("o_orderpriority").parquet(dir)
    dir
  }

  private def fileState(dir: String, part: String): Seq[(String, Long)] = {
    val p = java.nio.file.Paths.get(dir, s"o_orderpriority=$part")
    java.nio.file.Files.list(p).toArray.map(_.toString).sorted.toSeq
      .map(f => f -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f)).toMillis)
  }

  test("upsert replaces keys, inserts new rows, and never touches " +
    "unaffected partitions' files") {
    val dir = freshTable()
    val before = spark.read.parquet(dir)
    // materialize every pre-upsert read NOW: the table mutates in place,
    // so a pre-swap plan evaluated later would list vanished files
    val beforeCount = before.count()
    val replacedKeys = before.filter(col("o_orderpriority") === "2-HIGH")
      .orderBy("o_orderkey").limit(2)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val untouched = fileState(dir, "5-LOW")
    val updates = spark.range(1, 4).select(
      (col("id") * 1000000L + 7L).as("o_orderkey"), // new keys
      lit(9.99).as("o_totalprice"),
      lit("1-URGENT").as("o_orderpriority"))
      .unionByName(
        spark.createDataset(replacedKeys)(org.apache.spark.sql.Encoders.scalaLong)
          .toDF("o_orderkey")
          .select(col("o_orderkey"), lit(7777.0).as("o_totalprice"),
            lit("2-HIGH").as("o_orderpriority")))
    val (nParts, nRepl, nIns) = Upsert.upsertByKey(
      spark, dir, updates, "o_orderkey", "o_orderpriority")
    assert(nParts === 2L && nRepl === 2L && nIns === 3L)
    val after = Upsert.openMergedTable(spark, dir, "o_orderpriority")
    assert(after.count() === beforeCount + 3)
    assert(after.filter(col("o_totalprice") === 7777.0).count() === 2L)
    assert(fileState(dir, "5-LOW") === untouched,
      "an unaffected partition must keep byte-identical files")
  }

  test("a crashed swap (partition parked, live dir missing) heals on open") {
    val dir = freshTable()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = Upsert.openMergedTable(spark, dir, "o_orderpriority").count()
    // simulate the crash window: live renamed aside, replacement never landed
    require(fs.rename(new Path(dir, "o_orderpriority=3-MEDIUM"),
      new Path(s"${dir}__ups_old_3-MEDIUM")))
    val healed = Upsert.openMergedTable(spark, dir, "o_orderpriority")
    assert(healed.count() === before,
      "the read path must restore a parked partition, not silently drop it")
    assert(!fs.exists(new Path(s"${dir}__ups_old_3-MEDIUM")))
  }

  test("a mover whose OLD partition is NOT in the batch is detected and " +
    "merged correctly (affected set auto-widens; no duplicate key)") {
    val dir = freshTable()
    val victim = spark.read.parquet(dir)
      .filter(col("o_orderpriority") === "4-NOT SPECIFIED")
      .orderBy("o_orderkey").limit(1).collect().head.getLong(0)
    val before = Upsert.openMergedTable(spark, dir, "o_orderpriority").count()
    // the batch names ONLY the destination partition — the r7 contract
    // gap left the stale 4-NOT SPECIFIED copy alive as a duplicate
    val updates = spark.range(1).select(
      lit(victim).as("o_orderkey"), lit(2.0).as("o_totalprice"),
      lit("1-URGENT").as("o_orderpriority"))
    val (nParts, nRepl, nIns) = Upsert.upsertByKey(
      spark, dir, updates, "o_orderkey", "o_orderpriority")
    assert(nParts === 2L, "affected set must widen to the mover's old partition")
    assert(nRepl === 1L && nIns === 0L,
      "the mover is a REPLACE (its old copy is found), not an insert")
    val after = Upsert.openMergedTable(spark, dir, "o_orderpriority")
    assert(after.count() === before, "no net row change for a pure move")
    val rows = after.filter(col("o_orderkey") === victim).collect()
    assert(rows.length === 1, "the moved key must exist exactly once")
    assert(rows.head.getAs[String]("o_orderpriority") === "1-URGENT")
  }

  test("partition values needing path escaping (colon, percent) swap the " +
    "right directories") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ups_esc")
      .resolve("t").toString
    Seq((1L, 1.0, "a:b"), (2L, 2.0, "50%off"), (3L, 3.0, "plain"))
      .toDF("k", "v", "p").write.partitionBy("p").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(dir, "p=a%3Ab")),
      "fixture: Spark escapes ':' on write — the swap must follow suit")
    val updates = Seq((1L, 11.0, "a:b"), (4L, 44.0, "50%off"))
      .toDF("k", "v", "p")
    val (nParts, nRepl, nIns) = Upsert.upsertByKey(spark, dir, updates, "k", "p")
    assert(nParts === 2L && nRepl === 1L && nIns === 1L)
    val after = Upsert.openMergedTable(spark, dir, "p")
      .orderBy("k").collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("v")))
    assert(after.toSeq === Seq((1L, 11.0), (2L, 2.0), (3L, 3.0), (4L, 44.0)))
  }

  test("a key can move partitions when both are in the batch") {
    val dir = freshTable()
    val victim = spark.read.parquet(dir)
      .filter(col("o_orderpriority") === "4-NOT SPECIFIED")
      .orderBy("o_orderkey").limit(1).collect().head.getLong(0)
    val updates = spark.range(1).select(
      lit(victim).as("o_orderkey"), lit(1.0).as("o_totalprice"),
      lit("1-URGENT").as("o_orderpriority"))
      // a no-op row keeps the old partition in the affected set
      .unionByName(spark.read.parquet(dir)
        .filter(col("o_orderpriority") === "4-NOT SPECIFIED" &&
          col("o_orderkey") =!= victim)
        .orderBy("o_orderkey").limit(1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")))
    Upsert.upsertByKey(spark, dir, updates, "o_orderkey", "o_orderpriority")
    val after = Upsert.openMergedTable(spark, dir, "o_orderpriority")
      .filter(col("o_orderkey") === victim).collect()
    assert(after.length === 1, "the moved key must exist exactly once")
    assert(after.head.getAs[String]("o_orderpriority") === "1-URGENT")
  }
}
