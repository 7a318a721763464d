package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[SnapshotTable.readChangesBetween]] — the manifest-diff change
  * feed. Pins: appends surface as inserts; merges as delete+insert
  * pairs with carried rows cancelling; equality deletes report at
  * their commit version and do NOT re-report when applyDeletes later
  * materializes them; compaction is change-free; the feed composes
  * across schema evolution under the final schema.
  */
class SnapshotChangesSpec extends SparkSpec {

  private def freshTable(): String = {
    val t = java.nio.file.Files.createTempDirectory("snapcdc")
      .resolve("t").toString
    SnapshotTable.create(spark, t,
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority")),
      "o_orderpriority", statsCols = Seq("o_orderkey"))
    t
  }

  private def byType(df: DataFrame): Map[(String, Long), Long] =
    df.groupBy("_change_type", "_commit_version").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("append commits surface exactly the appended rows as inserts at " +
    "their commit version") {
    val t = freshTable()
    val batch = Tables.orders(spark, sfDir).filter(col("o_orderkey") % 500 === 0)
      .select((col("o_orderkey") + 7000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
    SnapshotTable.commitAppend(spark, t, batch, "o_orderpriority")
    val changes = SnapshotTable.readChangesBetween(spark, t, 1L, 2L)
    assert(byType(changes) === Map(("insert", 2L) -> batch.count()))
    assert(changes.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq ===
      batch.select("o_orderkey").orderBy("o_orderkey")
        .collect().map(_.getLong(0)).toSeq)
  }

  test("merge commits surface each update as a delete+insert pair; carried " +
    "rows in rewritten files cancel") {
    val t = freshTable()
    val updates = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        col("o_orderpriority"))
    SnapshotTable.commitMerge(spark, t, updates, "o_orderkey",
      "o_orderpriority")
    val n = updates.count()
    val changes = SnapshotTable.readChangesBetween(spark, t, 1L, 2L)
    assert(byType(changes) === Map(("delete", 2L) -> n, ("insert", 2L) -> n))
    // the delete side carries the OLD price, the insert side the new
    val byKey = changes.groupBy("o_orderkey")
      .agg(sum(when(col("_change_type") === "insert", col("o_totalprice"))
        .otherwise(-col("o_totalprice"))).as("price_delta"))
    assert(byKey.filter(abs(col("price_delta") - 1000.0) > 1e-6).count() === 0L)
  }

  test("equality deletes report once, at the delete commit — applyDeletes " +
    "and compaction are change-free") {
    val t = freshTable()
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 101 === 0 &&
        col("o_orderkey").between(1000, 5000))
      .select(col("o_orderkey"))
    val nKeys = keys.count()
    SnapshotTable.commitDeleteLazy(spark, t, keys, "o_orderkey") // v2
    SnapshotTable.applyDeletes(spark, t, "o_orderpriority")      // v3
    SnapshotTable.compact(spark, t, "o_orderpriority")           // v4

    assert(byType(SnapshotTable.readChangesBetween(spark, t, 1L, 2L)) ===
      Map(("delete", 2L) -> nKeys))
    // materialization and compaction change nothing logically
    assert(SnapshotTable.readChangesBetween(spark, t, 2L, 4L).count() === 0L)
    // the full window still reports the one logical delete
    assert(byType(SnapshotTable.readChangesBetween(spark, t, 1L, 4L)) ===
      Map(("delete", 2L) -> nKeys))
  }

  test("a key deleted then re-appended surfaces as delete@v2 + insert@v3, " +
    "and the feed reads under the final schema across evolution") {
    val t = freshTable()
    val one = Tables.orders(spark, sfDir).orderBy("o_orderkey").limit(1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    SnapshotTable.commitDeleteLazy(spark, t,
      one.select("o_orderkey"), "o_orderkey")                    // v2
    // re-append the key WITH a new column (ADD evolution)
    SnapshotTable.commitAppend(spark, t,
      one.withColumn("o_note", lit("back")), "o_orderpriority")  // v3
    val changes = SnapshotTable.readChangesBetween(spark, t, 1L, 3L)
    assert(changes.columns.contains("o_note"))
    assert(byType(changes) ===
      Map(("delete", 2L) -> 1L, ("insert", 3L) -> 1L))
    // the delete row (pre-evolution) reads o_note as null; the
    // re-insert carries it
    assert(changes.filter(col("_change_type") === "delete")
      .head().getAs[String]("o_note") === null)
    assert(changes.filter(col("_change_type") === "insert")
      .head().getAs[String]("o_note") === "back")
  }

  test("header-only commits (rename) are change-free and the feed uses " +
    "final column names") {
    val t = freshTable()
    SnapshotTable.renameColumn(spark, t, "o_totalprice", "price") // v2
    assert(SnapshotTable.readChangesBetween(spark, t, 1L, 2L).count() === 0L)
    val batch = Tables.orders(spark, sfDir).limit(3)
      .select((col("o_orderkey") + 8000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice").as("price"),
        col("o_orderpriority"))
    SnapshotTable.commitAppend(spark, t, batch, "o_orderpriority") // v3
    val changes = SnapshotTable.readChangesBetween(spark, t, 1L, 3L)
    assert(changes.columns.contains("price") &&
      !changes.columns.contains("o_totalprice"))
    assert(byType(changes) === Map(("insert", 3L) -> 3L))
  }
}
