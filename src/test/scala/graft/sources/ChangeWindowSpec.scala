package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two window probes commits feed to incremental consumers:
  * [[SnapshotTable.changedKeysBetween]] (file-level touched-key
  * over-approximation for absolute-state refreshes) and
  * [[SnapshotTable.readAppendWindow]] (the batch view of an
  * append-only log window, loud otherwise).
  */
class ChangeWindowSpec extends SparkSpec {
  import spark.implicits._

  private def table(): String = java.nio.file.Files
    .createTempDirectory("graft_chwin").resolve("t").toString

  private def rows(r: Range, tag: String) =
    r.map(i => (i.toLong, tag, i % 3L)).toDF("k", "v", "p")

  test("changedKeysBetween: a SUPERSET of the exactly-changed keys for " +
    "append, merge, and lazy-delete steps — never more than the touched files") {
    val t = table()
    SnapshotTable.create(spark, t, rows(0 until 90, "a"), "p")
    // v2: append 10 fresh keys
    SnapshotTable.commitAppend(spark, t, rows(90 until 100, "a"), "p")
    // v3: merge updates 4 keys inside ONE partition value (rewrites
    // only that partition's files)
    SnapshotTable.commitMerge(spark, t,
      Seq((3L, "B", 0L), (9L, "B", 0L), (12L, "B", 0L), (33L, "B", 0L))
        .toDF("k", "v", "p"), "k", "p")
    // v4: equality-delete 2 keys (no file rewritten, mask only)
    SnapshotTable.commitDeleteLazy(spark, t,
      Seq(5L, 40L).toDF("k"), "k")

    def keys(from: Long, to: Long): Set[Long] =
      SnapshotTable.changedKeysBetween(spark, t, from, to, "k")
        .collect().map(_.getLong(0)).toSet

    // append window: exactly the fresh keys (fresh files carry only them)
    assert(keys(1, 2) == (90L until 100L).toSet)

    // merge window: contains the 4 updated keys; the over-approximation
    // is FILE-local — only the rewritten partition's keys appear, never
    // the untouched partitions'
    val merge = keys(2, 3)
    assert(Set(3L, 9L, 12L, 33L).subsetOf(merge))
    assert(merge.forall(_ % 3 == 0),
      s"keys outside the rewritten partition leaked: $merge")

    // lazy-delete window: contains the masked keys (their candidate
    // files are touched candidates)
    val del = keys(3, 4)
    assert(Set(5L, 40L).subsetOf(del))

    // whole span: union of the steps
    assert((Set(3L, 9L, 12L, 33L, 5L, 40L) ++ (90L until 100L))
      .subsetOf(keys(1, 4)))
  }

  test("readAppendWindow: append-only windows read exactly the fresh rows; " +
    "rewrite or delete steps refuse loudly; empty windows are empty") {
    val t = table()
    SnapshotTable.create(spark, t, rows(0 until 50, "a"), "p")
    SnapshotTable.commitAppend(spark, t, rows(50 until 60, "b"), "p")
    SnapshotTable.commitAppend(spark, t, rows(60 until 70, "c"), "p")

    assert(SnapshotTable.readAppendWindow(spark, t, 1, 3)
      .select(col("k")).collect().map(_.getLong(0)).toSet ==
      (50L until 70L).toSet)
    assert(SnapshotTable.readAppendWindow(spark, t, 2, 3)
      .select(col("k")).collect().map(_.getLong(0)).toSet ==
      (60L until 70L).toSet)
    assert(SnapshotTable.readAppendWindow(spark, t, 3, 3).count() == 0L)

    SnapshotTable.commitMerge(spark, t,
      Seq((1L, "Z", 1L)).toDF("k", "v", "p"), "k", "p")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.readAppendWindow(spark, t, 3, 4).count()
    }
    assert(e.getMessage.contains("not append-only"))

    val t2 = table()
    SnapshotTable.create(spark, t2, rows(0 until 20, "a"), "p")
    SnapshotTable.commitDeleteLazy(spark, t2, Seq(1L).toDF("k"), "k")
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.readAppendWindow(spark, t2, 1, 2).count()
    }
    assert(e2.getMessage.contains("not append-only"))
  }
}
