package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SecondaryIndex.appendUnique]] — enforced unique key at commit
  * time. Must: reject conflicting batches in error mode without
  * committing; drop exactly the conflicting rows in skip mode; refuse
  * malformed batches (null / in-batch-duplicate keys) in both modes;
  * treat a DELETED key as free again (postings are false positives the
  * masked read must clear); stay correct through the scan fallback
  * (over-cap candidate list); be a version-unchanged no-op on a fully
  * conflicting batch.
  */
class UniqueAppendSpec extends SparkSpec {

  private def freshTable(): (String, String) = {
    val t = java.nio.file.Files.createTempDirectory("uniqapp")
      .resolve("t").toString
    val idx = t + "_idx"
    SnapshotTable.create(spark, t,
      spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 10).as("v"), (col("id") % 4).cast("string").as("p")),
      "p")
    SecondaryIndex.create(spark, t, "k", idx, buckets = 8)
    (t, idx)
  }

  private def batch(keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    keys.toDF("k").select(col("k"), (col("k") * 100).as("v"),
      (col("k") % 4).cast("string").as("p"))
  }

  private def tableKeys(t: String): Set[Long] =
    SnapshotTable.read(spark, t).select("k").collect()
      .map(_.getLong(0)).toSet

  test("error mode: conflicting batch refused, nothing committed") {
    val (t, idx) = freshTable()
    val v0 = SnapshotTable.currentVersion(spark, t)
    val e = intercept[IllegalArgumentException] {
      SecondaryIndex.appendUnique(spark, t, batch(Seq(5L, 200L)),
        "k", "p", idx)
    }
    assert(e.getMessage.contains("1 key(s)"))
    assert(SnapshotTable.currentVersion(spark, t) == v0)
    assert(!tableKeys(t).contains(200L))
  }

  test("skip mode: conflicts dropped whole, fresh rows land, index fresh") {
    val (t, idx) = freshTable()
    val (v, nIns, nConf) = SecondaryIndex.appendUnique(spark, t,
      batch(Seq(3L, 7L, 200L, 201L)), "k", "p", idx, onConflict = "skip")
    assert((nIns, nConf) == ((2L, 2L)))
    assert(v == SnapshotTable.currentVersion(spark, t))
    assert(SecondaryIndex.appliedVersion(spark, idx) == v)
    val rows = SnapshotTable.read(spark, t)
      .filter(col("k").isin(3L, 7L, 200L, 201L))
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // conflicting keys keep their ORIGINAL values (no update-in-place)
    assert(rows == Map(3L -> 30L, 7L -> 70L,
      200L -> 20000L, 201L -> 20100L))
  }

  test("fully conflicting batch: no commit, version unchanged") {
    val (t, idx) = freshTable()
    val v0 = SnapshotTable.currentVersion(spark, t)
    val (v, nIns, nConf) = SecondaryIndex.appendUnique(spark, t,
      batch(Seq(1L, 2L)), "k", "p", idx, onConflict = "skip")
    assert((v, nIns, nConf) == ((v0, 0L, 2L)))
    assert(SnapshotTable.currentVersion(spark, t) == v0)
  }

  test("malformed batches refused in both modes") {
    val (t, idx) = freshTable()
    intercept[IllegalArgumentException] {
      SecondaryIndex.appendUnique(spark, t, batch(Seq(300L, 300L)),
        "k", "p", idx, onConflict = "skip")
    }
    val withNull = batch(Seq(301L))
      .unionByName(batch(Seq(302L)).select(lit(null).cast("long").as("k"),
        col("v"), col("p")))
    intercept[IllegalArgumentException] {
      SecondaryIndex.appendUnique(spark, t, withNull, "k", "p", idx,
        onConflict = "skip")
    }
  }

  test("a deleted key is free again (masked postings do not reject)") {
    val (t, idx) = freshTable()
    SecondaryIndex.deleteKeys(spark, t, "k", idx, Seq(42L), "p")
    assert(!tableKeys(t).contains(42L))
    val (_, nIns, nConf) = SecondaryIndex.appendUnique(spark, t,
      batch(Seq(42L)), "k", "p", idx)
    assert((nIns, nConf) == ((1L, 0L)))
    assert(SnapshotTable.read(spark, t).filter(col("k") === 42L)
      .select("v").head().getLong(0) == 4200L)
  }

  test("scan fallback (over-cap candidates) reaches the same answer") {
    val (t, idx) = freshTable()
    val (_, nIns, nConf) = SecondaryIndex.appendUnique(spark, t,
      batch(Seq(11L, 400L)), "k", "p", idx, onConflict = "skip",
      maxFiles = 0)
    assert((nIns, nConf) == ((1L, 1L)))
    assert(tableKeys(t).contains(400L))
  }

  test("SQL procedure twin drives the same path") {
    SnapshotSql.register(spark)
    val (t, idx) = freshTable()
    batch(Seq(9L, 600L)).createOrReplaceTempView("ua_sql_batch")
    val out = spark.sql("SELECT * FROM snapshot_append_unique(" +
      s"'$t', 'ua_sql_batch', 'k', 'p', '$idx', 'skip')").head()
    assert((out.getLong(1), out.getLong(2)) == ((1L, 1L)))
    assert(tableKeys(t).contains(600L))
    intercept[Exception] {
      spark.sql("SELECT * FROM snapshot_append_unique(" +
        s"'$t', 'ua_sql_batch', 'k', 'p', '$idx', 'error')").collect()
    }
  }

  test("streaming sink: duplicates dropped; fresh-checkpoint restart moves nothing") {
    import graft.streaming.SnapshotSink
    val root = java.nio.file.Files.createTempDirectory("uniqsink").toString
    val (table, index) = (root + "/t", root + "/t_idx")
    // duplicated source: full corpus + an exact re-delivered slice
    val src = root + "/src"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.Tables.load(spark, sfDir, "events")
    ev.repartition(4).write.mode("append").parquet(src)
    ev.filter(col("event_id") % 7 === 0).repartition(2)
      .write.mode("append").parquet(src)
    SnapshotSink.runUniqueAppend(spark, src, ev.schema, table, index)
    val n = SnapshotTable.read(spark, table).count()
    assert(n == ev.count()) // every original once, every re-delivery dropped
    val v = SnapshotTable.currentVersion(spark, table)
    // FRESH checkpoint: every batch re-offered; the key constraint (not
    // a ledger tag) must make the whole replay a no-op
    SnapshotSink.runUniqueAppend(spark, src, ev.schema, table, index)
    assert(SnapshotTable.read(spark, table).count() == n)
    assert(SnapshotTable.currentVersion(spark, table) == v)
  }

  test("enforcement composes with a RELY declaration that stays true") {
    val (t, idx) = freshTable()
    SecondaryIndex.appendUnique(spark, t, batch(Seq(500L, 501L)),
      "k", "p", idx)
    // the declaration's validate pass agrees the key is still unique
    graft.plans.JoinElimination.declareUnique(spark, t, "k",
      validate = true)
  }
}
