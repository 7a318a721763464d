package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.AnnSearch

/** Targeted ANN index deletion ON SNAPSHOT TABLES: equals a
  * rebuild-without, rewrites only the files that contain requested ids
  * (the rest carry by reference), publishes as ONE atomic version —
  * readers pinned to the previous version keep serving it throughout
  * any maintenance, and the deleted rows stay auditable in old
  * versions until vacuum.
  */
class AnnDeleteSpec extends SparkSpec {

  test("delete == rebuild-without; untouched buckets' files carry by " +
    "reference; the delete is a version and v1 keeps the rows") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") =!= 0)
    val planes = AnnSearch.hyperplanes(4, 64, 42L)
    val indexed = AnnSearch.withLshBucket(corpus, "embedding", planes)

    val victim = Files.createTempDirectory("ann_delete").toString + "/victim"
    TableIO.writeAnnIndex(indexed, victim, "lsh_bucket")
    val m1 = SnapshotTable.readManifest(spark, victim, 1L)

    // delete the members of one bucket plus a few scattered ids + one
    // id that does not exist
    val byBucket = indexed.select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val someBucket = byBucket.head._2
    val doomed = byBucket.filter(_._2 == someBucket).map(_._1).take(3).toSeq ++
      byBucket.filter(_._2 != someBucket).map(_._1).take(2).toSeq
    val doomedBuckets = byBucket.filter(t => doomed.contains(t._1))
      .map(_._2.toString).toSet

    val (deleted, requested) = TableIO.deleteFromAnnIndex(
      spark, victim, "lsh_bucket", (doomed :+ 999999L).toDF("vec_id"))
    assert(requested === doomed.size + 1L)
    assert(deleted === doomed.size.toLong)

    // equality with a rebuild that never contained the doomed ids
    val expect = indexed.filter(!col("vec_id").isin(doomed: _*))
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = SnapshotTable.read(spark, victim)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === expect)

    // untouched buckets' files: carried into v2 BY REFERENCE (same paths)
    val m2 = SnapshotTable.readManifest(spark, victim, 2L)
    val untouched = m1.filter(
      !_.parts.forall(_.exists(doomedBuckets.contains)))
    assert(untouched.nonEmpty)
    assert(untouched.forall(e => m2.exists(_.path == e.path)),
      "files without a doomed bucket must carry by reference")

    // the delete is snapshot-isolated: v1 still has every row (the
    // audit trail a takedown log wants, reclaimed by vacuum)
    assert(SnapshotTable.readVersion(spark, victim, 1L).count()
      === indexed.count())

    // serving the pruned layout never sees a deleted id
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val served = TableIO.openAnnIndexBuckets(spark, victim, "lsh_bucket",
      AnnSearch.probeBuckets(q, planes))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(doomed.toSet).isEmpty)
  }

  test("a reader pinned before maintenance serves its version through " +
    "compact AND delete; the new current reflects both") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") =!= 0)
    val planes = AnnSearch.hyperplanes(2, 64, 42L)
    val victim = Files.createTempDirectory("ann_pin").toString + "/victim"
    TableIO.writeAnnIndex(AnnSearch.withLshBucket(
      corpus.filter(col("vec_id") % 2 === 1), "embedding", planes),
      victim, "lsh_bucket")
    TableIO.appendAnnIndex(AnnSearch.withLshBucket(
      corpus.filter(col("vec_id") % 2 === 0), "embedding", planes),
      victim, "lsh_bucket")

    val pinned = TableIO.openAnnIndex(spark, victim, "lsh_bucket")
    val pinnedRows = pinned.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(pinnedRows === corpus.select("vec_id").collect()
      .map(_.getLong(0)).toSet)

    // maintenance lands while the reader is live: compact folds the
    // append litter, then a delete removes one id — two new versions
    TableIO.compactAnnIndex(spark, victim, "lsh_bucket")
    val doomedId = pinnedRows.head
    TableIO.deleteFromAnnIndex(spark, victim, "lsh_bucket",
      Seq(doomedId).toDF("vec_id"))

    // the pinned plan still reads its version's (un-vacuumed) files
    assert(pinned.select("vec_id").collect().map(_.getLong(0)).toSet
      === pinnedRows, "pinned reader must be unaffected by maintenance")
    // a fresh open sees the compacted, deleted current
    assert(TableIO.openAnnIndex(spark, victim, "lsh_bucket")
      .select("vec_id").collect().map(_.getLong(0)).toSet
      === pinnedRows - doomedId)
    assert(SnapshotTable.versions(spark, victim) === Seq(1L, 2L, 3L, 4L))
  }

  test("delete rewrites only files containing hits: a one-id delete " +
    "touches one file's worth of rewrite, not the index") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir)
    val planes = AnnSearch.hyperplanes(2, 64, 42L)
    val victim = Files.createTempDirectory("ann_narrow").toString + "/victim"
    TableIO.writeAnnIndex(
      AnnSearch.withLshBucket(corpus, "embedding", planes),
      victim, "lsh_bucket")
    val m1 = SnapshotTable.readManifest(spark, victim, 1L)
    val id = SnapshotTable.read(spark, victim)
      .select("vec_id").head().getLong(0)
    TableIO.deleteFromAnnIndex(spark, victim, "lsh_bucket",
      Seq(id).toDF("vec_id"))
    val m2 = SnapshotTable.readManifest(spark, victim, 2L)
    val carried = m1.map(_.path).toSet.intersect(m2.map(_.path).toSet)
    assert(carried.size >= m1.size - 1,
      s"at most one file may be rewritten; carried ${carried.size} of ${m1.size}")
  }
}
