package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Conditional MERGE INTO ([[SnapshotTable.commitMergeInto]]) and named
  * refs ([[SnapshotTable.setRef]]/readRef/readAsOf) — clause semantics
  * on a hand-built table small enough to assert row-for-row.
  */
class SnapshotMergeIntoSpec extends SparkSpec {

  import SnapshotTable.src

  private def freshTable(): String = {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("snapmi")
      .resolve("t").toString
    val base = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 40.0), (5L, "b", 50.0))
      .toDF("k", "p", "price")
    SnapshotTable.create(spark, table, base, "p")
    table
  }

  private def rows(df: DataFrame): Seq[(Long, String, Double)] =
    df.select(col("k"), col("p"), col("price")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("all three clauses in one commit: delete-before-update order, " +
    "partial update, conditional insert, NULL conditions don't fire") {
    import spark.implicits._
    val table = freshTable()
    // k=1: matched, delete fires (src price < 15)
    // k=2: matched, delete misses, update fires → price := src price
    // k=3: matched, update condition evaluates NULL → row kept as-is
    // k=6: unmatched, insert condition passes
    // k=7: unmatched, insert condition fails → dropped
    val source = Seq(
      (1L, "a", 12.0), (2L, "a", 99.0), (3L, "a", Double.NaN),
      (6L, "b", 60.0), (7L, "b", -1.0))
      .toDF("k", "p", "price")
      // a NULL source price for k=3 makes every clause condition UNKNOWN
      .withColumn("price", when(isnan(col("price")), lit(null)
        .cast("double")).otherwise(col("price")))
    val (v, nU, nD, nI) = SnapshotTable.commitMergeInto(
      spark, table, source, "k", "p",
      updateWhen = Some(src("price") > 0),
      updateSet = Seq("price" -> src("price")),
      deleteWhen = Some(src("price") < 15.0),
      insertWhen = Some(col("price") > 0))
    assert(v === 2L)
    assert((nU, nD, nI) === ((1L, 1L, 1L)))
    assert(rows(SnapshotTable.read(spark, table)) === Seq(
      (2L, "a", 99.0), (3L, "a", 30.0), (4L, "b", 40.0),
      (5L, "b", 50.0), (6L, "b", 60.0)))
  }

  test("absent clauses: no update clause keeps matched rows; no insert " +
    "clause drops unmatched source rows; whole-row replace when " +
    "updateSet is empty") {
    import spark.implicits._
    val table = freshTable()
    // delete-only merge: absent update/insert clauses
    val (_, nU, nD, nI) = SnapshotTable.commitMergeInto(
      spark, table, Seq((2L, "a", 0.0), (9L, "z", 9.0)).toDF("k", "p", "price"),
      "k", "p", deleteWhen = Some(lit(true)))
    assert((nU, nD, nI) === ((0L, 1L, 0L)))
    assert(rows(SnapshotTable.read(spark, table)).map(_._1) ===
      Seq(1L, 3L, 4L, 5L))

    // whole-row replace: empty updateSet takes every source column,
    // including a partition move (a→b for k=3)
    val (_, nU2, _, _) = SnapshotTable.commitMergeInto(
      spark, table, Seq((3L, "b", 333.0)).toDF("k", "p", "price"),
      "k", "p", updateWhen = Some(lit(true)))
    assert(nU2 === 1L)
    assert(rows(SnapshotTable.read(spark, table))
      .find(_._1 == 3L).get === ((3L, "b", 333.0)))
  }

  test("cross-partition movers: a matched key in another partition is " +
    "found and updated; unaffected partitions carry by reference") {
    import spark.implicits._
    val table = freshTable()
    val pre = SnapshotTable.readManifest(spark, table,
      SnapshotTable.currentVersion(spark, table))
    // source claims partition b, but k=1 lives in partition a: the
    // partial update must still find it (file-granular mover) and the
    // row keeps its true partition because only price is assigned
    val (_, nU, _, nI) = SnapshotTable.commitMergeInto(
      spark, table, Seq((1L, "b", 111.0)).toDF("k", "p", "price"),
      "k", "p", updateWhen = Some(lit(true)),
      updateSet = Seq("price" -> src("price")))
    assert(nU === 1L)
    assert(nI === 0L)
    assert(rows(SnapshotTable.read(spark, table))
      .find(_._1 == 1L).get === ((1L, "a", 111.0)))
    assert(pre.nonEmpty)
  }

  test("duplicate source keys and unknown updateSet columns are refused; " +
    "a replayed tag is a no-op") {
    import spark.implicits._
    val table = freshTable()
    val dup = Seq((2L, "a", 1.0), (2L, "a", 2.0)).toDF("k", "p", "price")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitMergeInto(spark, table, dup, "k", "p",
        updateWhen = Some(lit(true)))
    }
    assert(e.getMessage.contains("multiple source rows"))

    val bad = intercept[IllegalArgumentException] {
      SnapshotTable.commitMergeInto(spark, table,
        Seq((2L, "a", 1.0)).toDF("k", "p", "price"), "k", "p",
        updateWhen = Some(lit(true)),
        updateSet = Seq("nope" -> lit(1.0)))
    }
    assert(bad.getMessage.contains("unknown column"))

    val src1 = Seq((2L, "a", 77.0)).toDF("k", "p", "price")
    val (v1, _, _, _) = SnapshotTable.commitMergeInto(spark, table, src1,
      "k", "p", updateWhen = Some(lit(true)),
      updateSet = Seq("price" -> src("price")), tag = Some("batch-7"))
    val (v2, nU, nD, nI) = SnapshotTable.commitMergeInto(spark, table, src1,
      "k", "p", updateWhen = Some(lit(true)),
      updateSet = Seq("price" -> src("price")), tag = Some("batch-7"))
    assert(v2 === v1)
    assert((nU, nD, nI) === ((0L, 0L, 0L)))
  }

  test("insert-only merge into untouched partitions rewrites nothing") {
    import spark.implicits._
    val table = freshTable()
    val v1 = SnapshotTable.currentVersion(spark, table)
    val prePaths = SnapshotTable.readManifest(spark, table, v1)
      .map(_.path).toSet
    val (_, nU, nD, nI) = SnapshotTable.commitMergeInto(
      spark, table, Seq((8L, "c", 80.0), (9L, "c", 90.0)).toDF("k", "p", "price"),
      "k", "p", insertWhen = Some(lit(true)))
    assert((nU, nD, nI) === ((0L, 0L, 2L)))
    val post = SnapshotTable.readManifest(spark, table, v1 + 1)
    // every pre-existing file carried by reference; only fresh files new
    assert(prePaths.subsetOf(post.map(_.path).toSet))
    assert(rows(SnapshotTable.read(spark, table)).size === 7)
  }

  test("named refs: pin, read, overwrite semantics, vacuum protection, " +
    "drop, and timestamp AS OF") {
    import spark.implicits._
    val table = freshTable()
    val v1Rows = rows(SnapshotTable.read(spark, table))
    Thread.sleep(1100) // mtime resolution on local fs can be 1 s
    val tBetween = System.currentTimeMillis()
    SnapshotTable.commitMerge(spark, table,
      Seq((2L, "a", 222.0)).toDF("k", "p", "price"), "k", "p")

    SnapshotTable.setRef(spark, table, "audited", Some(1L))
    assert(SnapshotTable.refs(spark, table) === Map("audited" -> 1L))
    assert(rows(SnapshotTable.readRef(spark, table, "audited")) === v1Rows)
    // re-point needs overwrite
    intercept[IllegalArgumentException] {
      SnapshotTable.setRef(spark, table, "audited", Some(2L))
    }
    SnapshotTable.setRef(spark, table, "audited", Some(1L), overwrite = true)

    // vacuum keeps the pinned version alive past keepVersions
    SnapshotTable.vacuum(spark, table, keepVersions = 1)
    assert(SnapshotTable.versions(spark, table) === Seq(1L, 2L))
    assert(rows(SnapshotTable.readVersion(spark, table, 1L)) === v1Rows)

    // AS OF: between the commits resolves v1; now resolves v2; before
    // the table existed is loud
    assert(SnapshotTable.versionAsOf(spark, table, tBetween) === 1L)
    assert(SnapshotTable.versionAsOf(spark, table,
      System.currentTimeMillis()) === 2L)
    intercept[RuntimeException] {
      SnapshotTable.versionAsOf(spark, table, tBetween - 3600000L)
    }

    // dropping the ref releases the pin
    SnapshotTable.dropRef(spark, table, "audited")
    assert(SnapshotTable.refs(spark, table).isEmpty)
    SnapshotTable.vacuum(spark, table, keepVersions = 1)
    assert(SnapshotTable.versions(spark, table) === Seq(2L))
  }
}
