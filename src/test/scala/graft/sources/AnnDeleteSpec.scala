package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.AnnSearch

/** Targeted ANN index deletion: equals a rebuild-without, rewrites only
  * the hit partitions, reconciles counts, and serving never returns a
  * deleted id.
  */
class AnnDeleteSpec extends SparkSpec {

  test("delete == rebuild-without; untouched buckets keep their files") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") =!= 0)
    val planes = AnnSearch.hyperplanes(4, 64, 42L)
    val indexed = AnnSearch.withLshBucket(corpus, "embedding", planes)

    val root = Files.createTempDirectory("ann_delete").toString
    val victim = root + "/victim"
    TableIO.writeAnnIndex(indexed, victim, "lsh_bucket")

    // delete the members of one bucket plus a few scattered ids + one
    // id that does not exist
    val byBucket = indexed.select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val someBucket = byBucket.head._2
    val doomed = byBucket.filter(_._2 == someBucket).map(_._1).take(3).toSeq ++
      byBucket.filter(_._2 != someBucket).map(_._1).take(2).toSeq
    val untouchedBucket = byBucket.map(_._2).distinct
      .find(b => !doomed.map(d => byBucket.find(_._1 == d).get._2).contains(b)).get
    def filesOf(b: Int): Set[(String, Long)] = {
      val d = Paths.get(victim, s"lsh_bucket=$b")
      Files.list(d).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, Files.getLastModifiedTime(p).toMillis))
        .toSet
    }
    val untouchedBefore = filesOf(untouchedBucket)

    val (deleted, requested) = TableIO.deleteFromAnnIndex(
      spark, victim, "lsh_bucket", (doomed :+ 999999L).toDF("vec_id"))
    assert(requested === doomed.size + 1L)
    assert(deleted === doomed.size.toLong)

    // equality with a rebuild that never contained the doomed ids
    val expect = indexed.filter(!col("vec_id").isin(doomed: _*))
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = spark.read.parquet(victim)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === expect)

    // untouched bucket: identical file names AND mtimes
    assert(filesOf(untouchedBucket) === untouchedBefore)

    // serving the pruned layout never sees a deleted id
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val served = spark.read.parquet(victim)
      .filter(col("lsh_bucket").isin(AnnSearch.probeBuckets(q, planes): _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(doomed.toSet).isEmpty)
  }

  test("rewritten bucket keeps its pre-delete file count (no coalesce(1) collapse)") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir)
    val planes = AnnSearch.hyperplanes(2, 64, 42L)
    val indexed = AnnSearch.withLshBucket(corpus, "embedding", planes)
      .repartition(4) // several files per bucket partition
    val root = Files.createTempDirectory("ann_delete_files").toString
    val victim = root + "/victim"
    TableIO.writeAnnIndex(indexed, victim, "lsh_bucket")

    val (id, bucket) = {
      val r = spark.read.parquet(victim).select("vec_id", "lsh_bucket").head()
      (r.getLong(0), r.getInt(1))
    }
    def nFiles: Int = {
      val d = Paths.get(victim, s"lsh_bucket=$bucket")
      Files.list(d).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .count(_.getFileName.toString.endsWith(".parquet"))
    }
    val before = nFiles
    assert(before > 1, "fixture must start with a multi-file bucket")
    TableIO.deleteFromAnnIndex(spark, victim, "lsh_bucket", Seq(id).toDF("vec_id"))
    assert(nFiles === before)
  }

  test("a crash between the swap renames is recovered on the next call") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir)
    val planes = AnnSearch.hyperplanes(2, 64, 42L)
    val indexed = AnnSearch.withLshBucket(corpus, "embedding", planes)
    val root = Files.createTempDirectory("ann_delete_crash").toString
    val victim = root + "/victim"
    TableIO.writeAnnIndex(indexed, victim, "lsh_bucket")
    val all = spark.read.parquet(victim)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val crashBucket = all.head._2

    // simulate a crash BETWEEN rename(dir -> old) and rename(tmp -> dir):
    // the live bucket dir is gone, the data is parked in __del_old_, and a
    // stale __del_tmp_ from the aborted rewrite is also left behind
    val live = Paths.get(victim, s"lsh_bucket=$crashBucket")
    val parked = Paths.get(victim + s"__del_old_$crashBucket")
    Files.move(live, parked)
    Files.createDirectory(Paths.get(victim + s"__del_tmp_$crashBucket"))

    // next deletion call recovers first, then deletes one unrelated id
    val otherId = all.find(_._2 != crashBucket).get._1
    val (deleted, _) = TableIO.deleteFromAnnIndex(
      spark, victim, "lsh_bucket", Seq(otherId).toDF("vec_id"))
    assert(deleted === 1L)
    assert(Files.exists(live), "parked bucket must be restored")
    assert(!Files.exists(parked))
    assert(!Files.exists(Paths.get(victim + s"__del_tmp_$crashBucket")))
    val got = spark.read.parquet(victim)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === all.toSet - all.find(_._1 == otherId).get)
  }

  test("openAnnIndex heals a crashed swap on the READ path — a plain " +
    "reader would silently miss the parked bucket") {
    val corpus = Tables.embeddings(spark, sfDir)
    val planes = AnnSearch.hyperplanes(2, 64, 42L)
    val indexed = AnnSearch.withLshBucket(corpus, "embedding", planes)
    val root = Files.createTempDirectory("ann_open_heal").toString
    val victim = root + "/victim"
    TableIO.writeAnnIndex(indexed, victim, "lsh_bucket")
    val all = spark.read.parquet(victim)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val crashBucket = all.head._2
    val live = Paths.get(victim, s"lsh_bucket=$crashBucket")
    val parked = Paths.get(victim + s"__del_old_$crashBucket")
    Files.move(live, parked)

    // evidence of the failure mode: the bare read misses the bucket
    val bare = spark.read.parquet(victim).count()
    assert(bare < all.size, "precondition: plain read must see the hole")

    val healed = TableIO.openAnnIndex(spark, victim, "lsh_bucket")
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(healed === all, "openAnnIndex must restore and serve the full index")
    assert(Files.exists(live) && !Files.exists(parked))
  }
}
