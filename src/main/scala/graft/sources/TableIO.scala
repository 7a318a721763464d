package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for engine outputs — the at-rest half of the scale design.
  *
  * The reference has zero I/O (everything lives in Python dicts,
  * similarity_search.py:263-292); a standalone engine needs durable
  * indexes. Layout choices ARE the 100 TB story:
  *
  *  - the patient/vector index is written `partitionBy(hospital)` so every
  *    per-shard operation (local top-k, local training, per-hospital
  *    stats) prunes to its own partition directories — `PartitionFilters`
  *    in the scan, zero bytes read from other shards;
  *  - an ANN index adds the LSH bucket / IVF list as a second partition
  *    column: a query's probe set becomes a partition-pruned scan of
  *    h+1 (multiprobe) or nprobe directories out of 2^h / nLists;
  *  - plain parquet keeps the whole index readable by any engine
  *    (including the DuckDB oracle).
  */
object TableIO {

  /** Write the vector index partitioned by shard. */
  def writeIndex(index: DataFrame, path: String,
                 partitionCols: Seq[String] = Seq("hospital")): Unit =
    index.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write an ANN-ready index: shard + bucket partitioning (bucket =
    * lsh_bucket or ivf_list column added by [[graft.operators.AnnSearch]]).
    */
  def writeAnnIndex(indexed: DataFrame, path: String, bucketCol: String): Unit =
    indexed.write.mode(SaveMode.Overwrite)
      .partitionBy(bucketCol)
      .parquet(path)

  /** INCREMENTAL index maintenance: hash/assign only the NEW vectors and
    * append their files into the existing bucket partition directories —
    * the at-rest answer to the reference's per-update full index rebuild
    * (similarity_search.py:284-286, the one part of the reference a
    * scale design must NOT mirror). Dynamic partition append touches
    * only the partitions the new batch lands in; existing files are
    * never rewritten, and serve-path partition pruning is unchanged.
    * (Periodic compaction of small appended files is an offline
    * housekeeping job, orthogonal to correctness.)
    */
  def appendAnnIndex(indexed: DataFrame, path: String, bucketCol: String): Unit =
    indexed.write.mode(SaveMode.Append)
      .partitionBy(bucketCol)
      .parquet(path)

  /** Offline compaction for an append-maintained index: every append
    * lands new small files in the bucket directories it touches; after
    * many appends a serve-path scan pays per-file open cost. Compaction
    * rewrites the index hash-partitioned ON the bucket column — each
    * bucket collapses into a single task and therefore a single file —
    * then swaps directories via two renames (atomic on HDFS-like
    * filesystems; on an object store without atomic rename, point
    * serving at versioned index paths instead and flip the pointer).
    * Run it like any housekeeping job: off the serve path, per index,
    * when file counts grow.
    */
  def compactAnnIndex(spark: SparkSession, path: String, bucketCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = path.stripSuffix("/") + "__compacting"
    val old = path.stripSuffix("/") + "__precompact"
    // heal any crashed delete swap FIRST: compacting an index with a
    // parked __del_old_ bucket would bake the hole into the rewrite
    recoverDeleteLeftovers(
      new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, bucketCol)
    spark.read.parquet(path)
      .repartition(org.apache.spark.sql.functions.col(bucketCol))
      .write.mode(SaveMode.Overwrite).partitionBy(bucketCol).parquet(tmp)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(old), true)
    require(fs.rename(new Path(path), new Path(old)), s"compact: could not stage $path aside")
    require(fs.rename(new Path(tmp), new Path(path)), s"compact: could not move $tmp into place")
    fs.delete(new Path(old), true)
  }

  /** TARGETED deletion from an append-maintained index (the GDPR /
    * takedown maintenance op next to [[appendAnnIndex]] and
    * [[compactAnnIndex]]): only the bucket partitions that actually
    * CONTAIN requested ids are rewritten (anti-join within each), via
    * per-partition dir swap; untouched buckets keep their files
    * byte-for-byte. Ids absent from the index are counted, not errors —
    * a deletion list routinely outlives the rows it names. Returns
    * (deleted, requested) counts so callers can log reconciliation.
    *
    * CONCURRENCY CONTRACT: the per-bucket swap (rename dir aside, rename
    * rewrite into place) is NOT atomic — between the two renames the live
    * bucket directory is absent, so a concurrent reader fails or silently
    * misses that bucket. Run deletions with exclusive access to the index,
    * like [[compactAnnIndex]] (serve from versioned paths and flip a
    * pointer if readers can't be paused). A crash between the renames is
    * recovered on the NEXT call: [[recoverDeleteLeftovers]] restores any
    * bucket parked in `__del_old_` whose live dir is missing and clears
    * stale staging dirs before new work starts.
    *
    * Each rewritten bucket keeps its original file count (rewrite is
    * repartitioned to the bucket's pre-delete parquet file count, floor 1)
    * — a delete never collapses a many-file bucket into one file/one task
    * the way an unconditional coalesce(1) would at scale.
    */
  def deleteFromAnnIndex(spark: SparkSession, path: String, bucketCol: String,
                         ids: DataFrame, idCol: String = "vec_id"): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDeleteLeftovers(fs, path, bucketCol)
    val requested = ids.select(col(idCol)).distinct().cache()
    val nRequested = requested.count()
    val index = spark.read.parquet(path)
    val hit = index.join(requested, Seq(idCol), "left_semi")
      .groupBy(col(bucketCol))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1))
    var deleted = 0L
    for ((bucket, n) <- hit) {
      val dir = s"${path.stripSuffix("/")}/$bucketCol=$bucket"
      // staging dirs are SIBLINGS of the index root, not of the partition
      // dir — a `bucket=3__deleting` inside the root would confuse
      // partition discovery for any concurrent reader
      val tmp = s"${path.stripSuffix("/")}__del_tmp_$bucket"
      val old = s"${path.stripSuffix("/")}__del_old_$bucket"
      // preserve the bucket's file count across the rewrite (see scaladoc)
      val nFiles = fs.listStatus(new Path(dir))
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      spark.read.parquet(dir)
        .join(requested, Seq(idCol), "left_anti")
        .repartition(math.max(1, nFiles))
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      fs.delete(new Path(old), true)
      require(fs.rename(new Path(dir), new Path(old)), s"delete: could not stage $dir aside")
      require(fs.rename(new Path(tmp), new Path(dir)), s"delete: could not move $tmp into place")
      fs.delete(new Path(old), true)
      deleted += n
    }
    requested.unpersist()
    (deleted, nRequested)
  }

  /** READ-path index open that heals a crashed [[deleteFromAnnIndex]]
    * swap first: without this, a crash between the two renames leaves a
    * bucket parked in `__del_old_` that plain `spark.read.parquet`
    * silently misses until the NEXT mutation runs recovery. The check is
    * one `listStatus` of the parent dir (no-op when clean), so serve
    * paths can afford it on every open; recovery itself only engages on
    * leftovers. Mutating callers keep their exclusive-access contract;
    * healing is idempotent, so a reader racing the recovery of another
    * reader at worst re-lists.
    */
  def openAnnIndex(spark: SparkSession, path: String, bucketCol: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    recoverDeleteLeftovers(
      new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, bucketCol)
    spark.read.parquet(path)
  }

  /** Crash recovery for [[deleteFromAnnIndex]]'s two-rename swap: a
    * `__del_old_<bucket>` sibling whose live `bucketCol=<bucket>` dir is
    * missing marks a crash BETWEEN the renames — rename it back (the old
    * data is intact; the delete simply didn't happen). One whose live dir
    * exists is post-swap cleanup debris — remove it. Stale `__del_tmp_`
    * staging dirs are always safe to remove (tmp is only renamed into
    * place after old is parked, so a surviving tmp was never live).
    */
  private[graft] def recoverDeleteLeftovers(fs: org.apache.hadoop.fs.FileSystem,
                                            path: String, bucketCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path.stripSuffix("/"))
    val parent = root.getParent
    if (parent == null || !fs.exists(parent)) return
    val oldPrefix = root.getName + "__del_old_"
    val tmpPrefix = root.getName + "__del_tmp_"
    fs.listStatus(parent).map(_.getPath).foreach { p =>
      val name = p.getName
      if (name.startsWith(tmpPrefix)) fs.delete(p, true)
      else if (name.startsWith(oldPrefix)) {
        val bucket = name.stripPrefix(oldPrefix)
        val live = new Path(root, s"$bucketCol=$bucket")
        if (!fs.exists(live)) require(fs.rename(p, live), s"recover: could not restore $p to $live")
        else fs.delete(p, true)
      }
    }
  }

  /** Persist an IVF coarse quantizer next to its list-partitioned index
    * (sibling dir — writing inside the index root would break partition
    * discovery). Centroids are k × dim doubles: tiny, but durable so a
    * cold process can serve without re-fitting.
    */
  def writeIvfCentroids(spark: SparkSession, indexPath: String,
                        centroids: Array[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath(indexPath))
  }

  def readIvfCentroids(spark: SparkSession, indexPath: String): Array[Array[Double]] =
    spark.read.parquet(centroidsPath(indexPath))
      .orderBy("list_id")
      .collect().map(_.getSeq[Double](1).toArray)

  def centroidsPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "__centroids"

  /** Persist the LSH hyperplanes next to their bucket-partitioned index
    * (the IVF-centroid pattern): h × dim doubles plus the seed, durable so
    * a cold process probes with the exact planes the index was built with
    * — a seed mismatch between build and serve silently zeroes recall.
    */
  def writeLshPlanes(spark: SparkSession, indexPath: String,
                     planes: Array[Array[Double]], seed: Long): Unit = {
    import spark.implicits._
    planes.zipWithIndex.map { case (p, i) => (i, p, seed) }.toSeq
      .toDF("plane_id", "plane", "seed")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(planesPath(indexPath))
  }

  def readLshPlanes(spark: SparkSession, indexPath: String): Array[Array[Double]] =
    spark.read.parquet(planesPath(indexPath))
      .orderBy("plane_id")
      .collect().map(_.getSeq[Double](1).toArray)

  def planesPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "__planes"

  /** Persist PQ codebooks next to their codes table (the centroid/plane
    * sidecar pattern): m × k sub-centroids, keyed (subspace, code).
    */
  def writePqCodebooks(spark: SparkSession, indexPath: String,
                       books: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    (for ((book, j) <- books.zipWithIndex; (c, i) <- book.zipWithIndex)
      yield (j, i, c.toSeq)).toSeq
      .toDF("subspace", "code", "center")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(pqBooksPath(indexPath))
  }

  def readPqCodebooks(spark: SparkSession, indexPath: String): Array[Array[Array[Double]]] =
    spark.read.parquet(pqBooksPath(indexPath))
      .orderBy("subspace", "code")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2).toArray).toArray

  def pqBooksPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "__pqbooks"
}
