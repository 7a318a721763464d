package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[IncrementalView]] — change-feed-driven materialized-view
  * maintenance. Pins: stepwise refresh ≡ one-shot refresh ≡ recompute
  * (exact decimal arithmetic); refresh retries no-op on the tag
  * ledger; groups whose count reaches zero vanish from the view and
  * can return later.
  */
class IncrementalViewSpec extends SparkSpec {

  private def orders4 = Tables.orders(spark, sfDir)
    .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      col("o_orderpriority"))

  private def recompute(src: String): Seq[String] =
    SnapshotTable.read(spark, src)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"))
      .orderBy("o_orderpriority").collect().map(_.toString).toSeq

  private def viewRows(view: String): Seq[String] =
    SnapshotTable.read(spark, view)
      .orderBy("o_orderpriority").collect().map(_.toString).toSeq

  test("stepwise refresh equals recompute after every source commit, " +
    "and a second refresh is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("mv")
    val (src, view) = (s"$dir/src", s"$dir/view")
    SnapshotTable.create(spark, src, orders4, "o_orderpriority",
      statsCols = Seq("o_orderkey"))
    IncrementalView.create(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recompute(src))

    // commit 1: append
    SnapshotTable.commitAppend(spark, src, orders4.limit(20)
      .select((col("o_orderkey") + 9000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
      "o_orderpriority")
    IncrementalView.refresh(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recompute(src))

    // commit 2: merge (update prices)
    SnapshotTable.commitMerge(spark, src,
      orders4.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          col("o_orderpriority")),
      "o_orderkey", "o_orderpriority")
    IncrementalView.refresh(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recompute(src))

    // commit 3: equality delete
    SnapshotTable.commitDeleteLazy(spark, src,
      orders4.filter(col("o_orderkey") % 101 === 0).select("o_orderkey"),
      "o_orderkey")
    val before = IncrementalView.appliedVersion(spark, view)
    IncrementalView.refresh(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recompute(src))
    assert(IncrementalView.appliedVersion(spark, view) > before)

    // retry: nothing new — view version unchanged by the no-op merge
    val rows = viewRows(view)
    IncrementalView.refresh(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === rows)
  }

  test("one-shot refresh over many commits equals the stepwise path, " +
    "and compaction in between contributes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("mv2")
    val (src, view) = (s"$dir/src", s"$dir/view")
    SnapshotTable.create(spark, src, orders4, "o_orderpriority")
    IncrementalView.create(spark, view, src, "o_orderpriority",
      "o_totalprice", atVersion = Some(1L))

    SnapshotTable.commitAppend(spark, src, orders4.limit(9)
      .select((col("o_orderkey") + 9100000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
      "o_orderpriority")
    SnapshotTable.compact(spark, src, "o_orderpriority")
    SnapshotTable.commitAppend(spark, src, orders4.limit(4)
      .select((col("o_orderkey") + 9200000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
      "o_orderpriority")

    IncrementalView.refresh(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recompute(src))
  }

  test("a group deleted to zero vanishes from the view and returns on " +
    "re-insert") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mv3")
    val (src, view) = (s"$dir/src", s"$dir/view")
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"))
      .toDF("k", "v", "g")
    SnapshotTable.create(spark, src, base, "g")
    IncrementalView.create(spark, view, src, "g", "v")
    assert(SnapshotTable.read(spark, view).count() === 2L)

    SnapshotTable.commitDeleteLazy(spark, src,
      Seq(3L).toDF("k"), "k") // group b empties
    IncrementalView.refresh(spark, view, src, "g", "v")
    assert(SnapshotTable.read(spark, view)
      .select("g").collect().map(_.getString(0)).toSeq === Seq("a"))

    SnapshotTable.commitAppend(spark, src,
      Seq((4L, 40.0, "b")).toDF("k", "v", "g"), "g")
    IncrementalView.refresh(spark, view, src, "g", "v")
    val b = SnapshotTable.read(spark, view).filter(col("g") === "b")
      .head()
    assert(b.getLong(b.fieldIndex("n")) === 1L)
  }

  private def recomputeFull(src: String): Seq[String] =
    SnapshotTable.read(spark, src)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"),
        min(col("o_totalprice").cast("decimal(18,2)")).as("vmin"),
        max(col("o_totalprice").cast("decimal(18,2)")).as("vmax"))
      .orderBy("o_orderpriority").collect().map(_.toString).toSeq

  test("min/max view: touched-group recompute tracks deletes that raise " +
    "a minimum, group vanish/return, and stepwise equals recompute") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mv4")
    val (src, view) = (s"$dir/src", s"$dir/view")
    SnapshotTable.create(spark, src, orders4, "o_orderpriority",
      statsCols = Seq("o_orderkey"))
    IncrementalView.createFull(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recomputeFull(src))

    // delete the global minimum rows of each group — the new minima
    // exist only in the SOURCE, so a delta-only maintenance would be
    // wrong here
    val minKeys = SnapshotTable.read(spark, src)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))))
      .filter(col("rk") <= 3).select("o_orderkey")
    SnapshotTable.commitDelete(spark, src,
      col("o_orderkey").isin(
        minKeys.collect().map(_.getLong(0)).toIndexedSeq: _*),
      "o_orderpriority")
    IncrementalView.refreshFull(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recomputeFull(src))

    // append + merge, then one refresh over both commits
    SnapshotTable.commitAppend(spark, src, orders4.limit(7)
      .select((col("o_orderkey") + 9300000L).as("o_orderkey"),
        col("o_custkey"), lit(0.01).as("o_totalprice"),
        col("o_orderpriority")), "o_orderpriority")
    SnapshotTable.commitMerge(spark, src,
      orders4.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          col("o_orderpriority")),
      "o_orderkey", "o_orderpriority")
    IncrementalView.refreshFull(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === recomputeFull(src))

    // retry is a no-op
    val rows = viewRows(view)
    IncrementalView.refreshFull(spark, view, src, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view) === rows)

    // vanish + return on a tiny table
    val (src2, view2) = (s"$dir/src2", s"$dir/view2")
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF(
      "o_orderkey", "o_totalprice", "o_orderpriority")
    SnapshotTable.create(spark, src2, base, "o_orderpriority")
    IncrementalView.createFull(spark, view2, src2, "o_orderpriority",
      "o_totalprice")
    SnapshotTable.commitDelete(spark, src2,
      col("o_orderkey") === 2L, "o_orderpriority")
    IncrementalView.refreshFull(spark, view2, src2, "o_orderpriority",
      "o_totalprice")
    assert(SnapshotTable.read(spark, view2).select("o_orderpriority")
      .collect().map(_.getString(0)).toSeq === Seq("a"))
    SnapshotTable.commitAppend(spark, src2,
      Seq((3L, 5.0, "b")).toDF("o_orderkey", "o_totalprice",
        "o_orderpriority"), "o_orderpriority")
    IncrementalView.refreshFull(spark, view2, src2, "o_orderpriority",
      "o_totalprice")
    assert(viewRows(view2) === recomputeFull(src2))
  }

  test("hash-bucketed min/max view: high-cardinality key, bounded file " +
    "count, refresh equals recompute") {
    val dir = java.nio.file.Files.createTempDirectory("mv5")
    val (src, view) = (s"$dir/src", s"$dir/view")
    SnapshotTable.create(spark, src, orders4, "o_orderpriority")
    IncrementalView.createFull(spark, view, src, "o_custkey",
      "o_totalprice", buckets = 8)
    // the layout is 8 buckets, not one file per customer
    assert(SnapshotTable.readManifest(spark, view, 1L)
      .flatMap(_.parts).flatten.distinct.size <= 8)

    SnapshotTable.commitMerge(spark, src,
      orders4.filter(col("o_orderkey") % 53 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") - 500.0).as("o_totalprice"),
          col("o_orderpriority")),
      "o_orderkey", "o_orderpriority")
    SnapshotTable.commitDelete(spark, src,
      col("o_orderkey") % 31 === 0, "o_orderpriority")
    IncrementalView.refreshFull(spark, view, src, "o_custkey",
      "o_totalprice", buckets = 8)

    val got = SnapshotTable.read(spark, view)
      .select("o_custkey", "n", "total", "vmin", "vmax")
      .orderBy("o_custkey").collect().map(_.toString).toSeq
    val want = SnapshotTable.read(spark, src)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"),
        min(col("o_totalprice").cast("decimal(18,2)")).as("vmin"),
        max(col("o_totalprice").cast("decimal(18,2)")).as("vmax"))
      .orderBy("o_custkey").collect().map(_.toString).toSeq
    assert(got === want)
  }
}
