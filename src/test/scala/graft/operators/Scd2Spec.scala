package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotTable

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private def changes(rows: (Long, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("k", "d", "attr", "tie")
      .select(col("k"), to_timestamp(col("d")).as("d"), col("attr"), col("tie"))

  private def dimRows(df: DataFrame): Seq[(Long, String, String, String, Boolean)] =
    df.select(col("k"), date_format(col("valid_from"), "yyyy-MM-dd"),
        date_format(col("valid_to"), "yyyy-MM-dd"), col("attr"),
        col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).getOrElse("-"), r.getString(3), r.getBoolean(4)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("buildDim: intervals partition the timeline; same-instant ties resolve by greatest tie") {
    val dim = Scd2.buildDim(changes(
      (1L, "2020-01-01", "a", 10L),
      (1L, "2020-03-01", "b", 20L),
      (1L, "2020-03-01", "c", 30L), // same instant — tie 30 wins
      (2L, "2020-02-01", "x", 5L)), "k", "d", Seq("attr"), "tie")
    assert(dimRows(dim) == Seq(
      (1L, "2020-01-01", "2020-03-01", "a", false),
      (1L, "2020-03-01", "-", "c", true),
      (2L, "2020-02-01", "-", "x", true)))
  }

  test("applyChanges ≡ global rebuild: appends close current rows; late and same-instant updates replay exactly") {
    val hist = changes(
      (1L, "2020-01-01", "a", 10L),
      (1L, "2020-06-01", "b", 20L),
      (2L, "2020-02-01", "x", 5L),
      (3L, "2020-04-01", "m", 7L))
    val batch = changes(
      (1L, "2020-09-01", "c", 40L), // normal append: closes (1, 06-01)
      (2L, "2020-01-15", "w", 6L),  // LATE: precedes 2's first version
      (1L, "2020-06-01", "B", 25L)) // same-instant UPDATE: beats tie 20
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft_scd2_spec").resolve("t").toString
    Scd2.createDim(spark, dimPath, hist, "k", "d", Seq("attr"), "tie", buckets = 2)
    Scd2.applyChanges(spark, dimPath, batch, "k", "d", Seq("attr"), "tie",
      buckets = 2)
    val global = Scd2.buildDim(hist.unionByName(batch), "k", "d",
      Seq("attr"), "tie")
    assert(dimRows(SnapshotTable.read(spark, dimPath)) == dimRows(global))
    // untouched key 3 must not have been rewritten into new rows twice
    assert(SnapshotTable.read(spark, dimPath).filter(col("k") === 3L)
      .count() == 1L)
  }

  test("applyChanges is tag-idempotent under retry") {
    val hist = changes((1L, "2020-01-01", "a", 1L))
    val batch = changes((1L, "2020-02-01", "b", 2L))
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft_scd2_retry").resolve("t").toString
    Scd2.createDim(spark, dimPath, hist, "k", "d", Seq("attr"), "tie", buckets = 2)
    Scd2.applyChanges(spark, dimPath, batch, "k", "d", Seq("attr"), "tie",
      buckets = 2, tag = Some("b1"))
    val v = SnapshotTable.currentVersion(spark, dimPath)
    Scd2.applyChanges(spark, dimPath, batch, "k", "d", Seq("attr"), "tie",
      buckets = 2, tag = Some("b1")) // replayed batch: ledger no-op
    assert(SnapshotTable.currentVersion(spark, dimPath) == v)
    assert(SnapshotTable.read(spark, dimPath).count() == 2L)
  }

  test("refreshFromLog: stream-driven maintenance ≡ global rebuild; " +
    "restart with a fresh checkpoint advances nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_stream")
    val log = root.resolve("log").toString
    val dim = root.resolve("dim").toString
    val hist = changes(
      (1L, "2020-01-01", "a", 10L),
      (2L, "2020-02-01", "x", 5L))
    val tail1 = changes((1L, "2020-06-01", "b", 20L))
    val tail2 = changes(
      (2L, "2020-01-15", "w", 6L),  // late
      (3L, "2020-04-01", "m", 7L))  // new key
    Scd2.createDim(spark, dim, hist, "k", "d", Seq("attr"), "tie",
      buckets = 2, tags = Set("scd2@1"))
    SnapshotTable.create(spark, log, hist.withColumn("p", lit(0L)), "p")
    SnapshotTable.commitAppend(spark, log, tail1.withColumn("p", lit(0L)), "p")
    SnapshotTable.commitAppend(spark, log, tail2.withColumn("p", lit(0L)), "p")

    graft.streaming.SnapshotSink.runScd2(spark, log, dim,
      "k", "d", Seq("attr"), "tie", buckets = 2)
    val global = Scd2.buildDim(
      hist.unionByName(tail1).unionByName(tail2), "k", "d", Seq("attr"), "tie")
    assert(dimRows(SnapshotTable.read(spark, dim)) == dimRows(global))
    assert(Scd2.appliedLogVersion(spark, dim) == 3L)

    // full restart from version 0 with a FRESH checkpoint: every window
    // replays, every refresh is a ledger no-op, the dim is untouched
    val v = SnapshotTable.currentVersion(spark, dim)
    graft.streaming.SnapshotSink.runScd2(spark, log, dim,
      "k", "d", Seq("attr"), "tie", buckets = 2)
    assert(SnapshotTable.currentVersion(spark, dim) == v)
    assert(dimRows(SnapshotTable.read(spark, dim)) == dimRows(global))
  }

  test("pointInTime: boundary instants join the starting version; pre-history facts drop") {
    val dim = Scd2.buildDim(changes(
      (1L, "2020-01-01", "a", 1L),
      (1L, "2020-03-01", "b", 2L)), "k", "d", Seq("attr"), "tie")
    val facts = Seq(
      (100L, 1L, "2019-12-31"), // before first version — dropped
      (101L, 1L, "2020-01-01"), // ON first boundary — version a
      (102L, 1L, "2020-02-29"), // inside [01-01, 03-01) — a
      (103L, 1L, "2020-03-01"), // ON second boundary — b
      (104L, 1L, "2021-01-01"), // current — b
      (105L, 9L, "2020-06-01")) // unknown key — dropped
      .toDF("fid", "k", "d")
      .select(col("fid"), col("k"), to_timestamp(col("d")).as("d"))
    val got = Scd2.pointInTime(facts, dim, "k", "k", col("d"),
        Seq("attr"), "tie")
      .select(col("fid"), col("attr")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(got == Seq((101L, "a"), (102L, "a"), (103L, "b"), (104L, "b")))
  }
}
