package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Delta-join view maintenance must equal the full recompute at every
  * step, count same-window fact+dim arrivals exactly once (ΔF joins
  * D_cur, ΔD joins F_PREV — the double-count trap), pick up orphaned
  * fact rows when their dim partner arrives later, no-op on replay,
  * and maintain non-append feeds (deletes / updates / dim re-keyings)
  * through the full bilinear signed-delta rule.
  */
class JoinViewSpec extends SparkSpec {

  private def freshDir(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("t").toString

  private def factDf(rows: (Long, Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("ok", "ck", "price").withColumn("p", lit("x"))
  }

  private def dimDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("dk", "seg")
  }

  private def recompute(fact: String, dim: String): Seq[(String, Long, Double)] = {
    val f = SnapshotTable.read(spark, fact)
    val d = SnapshotTable.read(spark, dim)
    f.join(d, f("ck") === d("dk"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(18,2)")).cast("double").as("t"))
      .orderBy(col("seg"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  private def viewState(view: String): Seq[(String, Long, Double)] =
    SnapshotTable.read(spark, view)
      .select(col("seg"), col("n"), col("total").cast("double"))
      .orderBy(col("seg"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  private def doRefresh(view: String, fact: String, dim: String) =
    IncrementalView.refreshJoin(spark, view, fact, dim,
      "ck", "dk", "seg", "price")

  test("stepwise delta-join refresh equals the recompute at every step, " +
    "including a same-window fact+dim arrival (counted once) and an " +
    "orphan fact row adopted when its dim partner lands") {
    val (fact, dim, view) =
      (freshDir("jvf"), freshDir("jvd"), freshDir("jvv"))
    SnapshotTable.create(spark, fact,
      factDf((1L, 1L, 10.0), (2L, 2L, 20.0)), "p")
    SnapshotTable.create(spark, dim,
      dimDf((1L, "S1"), (2L, "S2")), "seg")
    IncrementalView.createJoin(spark, view, fact, dim,
      "ck", "dk", "seg", "price")
    assert(viewState(view) === Seq(("S1", 1L, 10.0), ("S2", 1L, 20.0)))

    // fact-only append, incl. an ORPHAN row (ck=9 has no dim partner)
    SnapshotTable.commitAppend(spark, fact,
      factDf((3L, 1L, 30.0), (4L, 9L, 90.0)), "p")
    doRefresh(view, fact, dim)
    assert(viewState(view) === recompute(fact, dim))
    assert(viewState(view) === Seq(("S1", 2L, 40.0), ("S2", 1L, 20.0)))

    // same window: a fact row AND its brand-new dim partner (ck=3) —
    // ΔF⋈D_cur covers it; F_prev⋈ΔD must NOT count it again. The same
    // window's ΔD also adopts the earlier orphan (ck=9 → S2).
    SnapshotTable.commitAppend(spark, fact, factDf((5L, 3L, 50.0)), "p")
    SnapshotTable.commitAppend(spark, dim,
      dimDf((3L, "S1"), (9L, "S2")), "seg")
    doRefresh(view, fact, dim)
    assert(viewState(view) === recompute(fact, dim))
    assert(viewState(view) === Seq(("S1", 3L, 90.0), ("S2", 2L, 110.0)))

    // replayed refresh is a no-op (pair tag)
    val before = SnapshotTable.currentVersion(spark, view)
    doRefresh(view, fact, dim)
    assert(viewState(view) === recompute(fact, dim))
    assert(SnapshotTable.currentVersion(spark, view) === before)
  }

  test("full-CDC windows take the bilinear signed path: a fact price " +
    "update nets, a dim re-keying MOVES the group's rows, a fact delete " +
    "decrements, and a group netted to zero purges") {
    val (fact, dim, view) =
      (freshDir("jvf2"), freshDir("jvd2"), freshDir("jvv2"))
    SnapshotTable.create(spark, fact,
      factDf((1L, 1L, 10.0), (2L, 1L, 15.0), (3L, 2L, 20.0)), "p")
    SnapshotTable.create(spark, dim,
      dimDf((1L, "S1"), (2L, "S2")), "seg")
    IncrementalView.createJoin(spark, view, fact, dim,
      "ck", "dk", "seg", "price")
    assert(viewState(view) === Seq(("S1", 2L, 25.0), ("S2", 1L, 20.0)))

    // fact UPDATE (delete+insert pair in the feed): price 10 → 12
    SnapshotTable.commitMerge(spark, fact, factDf((1L, 1L, 12.0)), "ok", "p")
    doRefresh(view, fact, dim)
    assert(viewState(view) === recompute(fact, dim))
    assert(viewState(view) === Seq(("S1", 2L, 27.0), ("S2", 1L, 20.0)))

    // dim RE-KEYING: customer 1 moves S1 → S2 — its two fact rows must
    // move groups (−2 under S1 purges it, +2 under S2)
    val moved = dimDf((1L, "S2"))
    SnapshotTable.commitMerge(spark, dim, moved, "dk", "seg")
    doRefresh(view, fact, dim)
    assert(viewState(view) === recompute(fact, dim))
    assert(viewState(view) === Seq(("S2", 3L, 47.0)))

    // fact DELETE in the same window as a fact append
    import spark.implicits._
    SnapshotTable.commitDeleteKeys(spark, fact,
      Seq(3L).toDF("ok"), "ok", "p")
    SnapshotTable.commitAppend(spark, fact, factDf((4L, 2L, 40.0)), "p")
    doRefresh(view, fact, dim)
    assert(viewState(view) === recompute(fact, dim))
    assert(viewState(view) === Seq(("S2", 3L, 67.0)))

    // replay is still a no-op on the signed path
    val before = SnapshotTable.currentVersion(spark, view)
    doRefresh(view, fact, dim)
    assert(SnapshotTable.currentVersion(spark, view) === before)
    assert(viewState(view) === Seq(("S2", 3L, 67.0)))
  }

  test("the streaming composition — fact commit log tailed as a stream, " +
    "view refreshed per micro-batch — converges to the recompute, " +
    "catches up after more commits, and replays as a no-op") {
    val (fact, dim, view) =
      (freshDir("jvf3"), freshDir("jvd3"), freshDir("jvv3"))
    SnapshotTable.create(spark, fact, factDf((1L, 1L, 10.0)), "p")
    SnapshotTable.create(spark, dim,
      dimDf((1L, "S1"), (2L, "S2")), "seg")
    IncrementalView.createJoin(spark, view, fact, dim,
      "ck", "dk", "seg", "price")
    SnapshotTable.commitAppend(spark, fact, factDf((2L, 2L, 20.0)), "p")
    SnapshotTable.commitAppend(spark, fact, factDf((3L, 1L, 30.0)), "p")

    val checkpoint = java.nio.file.Files
      .createTempDirectory("jvckpt").toString
    def drive(): Unit = graft.streaming.SnapshotSink.runJoinView(
      spark, fact, dim, view, "ck", "dk", "seg", "price",
      checkpoint = Some(checkpoint))
    drive()
    assert(viewState(view) === recompute(fact, dim))
    assert(viewState(view) === Seq(("S1", 2L, 40.0), ("S2", 1L, 20.0)))

    // more commits land; the same checkpointed stream catches up
    SnapshotTable.commitAppend(spark, fact, factDf((4L, 2L, 40.0)), "p")
    drive()
    assert(viewState(view) === recompute(fact, dim))

    // nothing new: the run is a version no-op end to end
    val before = SnapshotTable.currentVersion(spark, view)
    drive()
    assert(SnapshotTable.currentVersion(spark, view) === before)
  }
}
