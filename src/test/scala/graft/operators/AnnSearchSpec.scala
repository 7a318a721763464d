package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions.cosineSimilarity

/** ANN recall measured against the exact brute-force top-k. */
class AnnSearchSpec extends SparkSpec {

  private lazy val corpus = Tables.embeddings(spark, sfDir)
    .filter(col("vec_id") =!= 0).cache()

  private lazy val queryVec: Array[Float] =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .head().getSeq[Float](1).toArray

  private lazy val bruteTop10: Set[Long] =
    corpus.withColumn("sim", cosineSimilarity(col("embedding"), typedlit(queryVec.toSeq)))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet

  test("LSH search returns k results ranked by exact cosine within candidates") {
    val hits = AnnSearch.lshSearch(corpus, "embedding", "vec_id", queryVec).collect()
    assert(hits.length == 10)
    val sims = hits.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("LSH multiprobe prunes the corpus yet keeps recall") {
    val planes = AnnSearch.hyperplanes(4, queryVec.length)
    val probes = AnnSearch.probeBuckets(queryVec, planes).toSet
    assert(probes.size == 5) // own bucket + 4 single-bit flips
    val candidates = AnnSearch.withLshBucket(corpus, "embedding", planes)
      .filter(col("lsh_bucket").isin(probes.toSeq: _*)).count()
    val total = corpus.count()
    assert(candidates < total, "bucketing must prune")
    val got = AnnSearch.lshSearch(corpus, "embedding", "vec_id", queryVec)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = got.intersect(bruteTop10).size / 10.0
    assert(recall >= 0.5, s"LSH recall@10 = $recall (candidates $candidates/$total)")
  }

  test("IVF search probes few lists and reaches high recall") {
    val (indexed, centroids) = AnnSearch.buildIvf(corpus, "embedding", nLists = 8)
    assert(centroids.length == 8)
    val nLists = indexed.select("ivf_list").distinct().count()
    assert(nLists <= 8)
    val got = AnnSearch.ivfSearch(indexed, centroids, "embedding", "vec_id",
      queryVec, topK = 10, nprobe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = got.intersect(bruteTop10).size / 10.0
    assert(recall >= 0.5, s"IVF recall@10 = $recall")
    // probing all lists must recover brute force exactly
    val full = AnnSearch.ivfSearch(indexed, centroids, "embedding", "vec_id",
      queryVec, topK = 10, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full == bruteTop10)
  }

  test("q_ann_lsh serves from the persisted bucket-partitioned index: " +
    "partition-pruned scan, no hashing UDF in the query") {
    val before = AnnSearch.lshBuildCount.get()
    val first = AnnSearch.lshQuery(spark, sfDir)
    assert(first.count() == 10)
    val second = AnnSearch.lshQuery(spark, sfDir)
    assert(second.count() == 10)
    assert(AnnSearch.lshBuildCount.get() <= before + 1,
      "index must be built at most once across repeated queries")
    // the probe set prunes at the MANIFEST — only the multiprobe
    // buckets' files are planned, not the corpus
    val (path, _) = AnnSearch.ensureLshIndex(spark, sfDir)
    val total = graft.sources.SnapshotTable.readManifest(spark, path,
      graft.sources.SnapshotTable.currentVersion(spark, path)).size
    assert(second.inputFiles.length < total,
      s"pruned scan expected: planned ${second.inputFiles.length} of $total files")
    val plan = second.queryExecution.executedPlan.toString
    // buckets were hashed once at BUILD: the serve plan evaluates no UDF
    assert(!plan.contains("UDF"), s"serve plan must not evaluate the bucket UDF:\n$plan")
    // serve rows must equal the inline (build-free) search on the same corpus
    val inline = AnnSearch.lshSearch(corpus, "embedding", "vec_id", queryVec)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val served = second.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(served == inline, "persisted-index serve must match inline search")
  }

  test("q_ann_batch: one pruned scan serves the whole query batch; " +
    "per-query results match the single-query search") {
    val batch = AnnSearch.batchLshQuery(spark, sfDir)
    val rows = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // plan: ONE manifest-pruned index scan + broadcast probe table
    val (lshPath, _) = AnnSearch.ensureLshIndex(spark, sfDir)
    val totalFiles = graft.sources.SnapshotTable.readManifest(spark, lshPath,
      graft.sources.SnapshotTable.currentVersion(spark, lshPath)).size
    assert(batch.inputFiles.length < totalFiles,
      s"pruned scan expected: planned ${batch.inputFiles.length} of $totalFiles files")
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "probe table must broadcast")
    // AQE prints Final + Initial plans; count scans in the final one only
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1,
      s"the index must be scanned once for the whole batch:\n$finalPlan")
    // parity: each query's top-3 equals the single-query LSH search with
    // self-matches excluded
    val (_, planes) = AnnSearch.ensureLshIndex(spark, sfDir)
    rows.groupBy(_._1).foreach { case (qid, got) =>
      val qv = corpus.filter(s"vec_id = $qid")
        .select("embedding").head().getSeq[Float](0).toArray
      val expected = AnnSearch.lshSearch(
          corpus.filter(s"vec_id <> $qid"), "embedding", "vec_id", qv, topK = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(got.sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq == expected,
        s"query $qid mismatch")
    }
  }

  test("incremental append: hashing only the new batch reproduces the " +
    "full-rebuild index (LSH and IVF), and serving is unchanged") {
    import org.apache.spark.sql.functions.col
    // fresh index in a private path: 80% initial build, 20% appended
    val all = corpus
    val initial = all.filter(col("vec_id") % 5 =!= 0)
    val late = all.filter(col("vec_id") % 5 === 0)
    val planes = AnnSearch.hyperplanes(4, 64, 42L)
    val path = java.nio.file.Files.createTempDirectory("ann_append").toString + "/lsh"
    graft.sources.TableIO.writeAnnIndex(
      AnnSearch.withLshBucket(initial, "embedding", planes), path, "lsh_bucket")
    graft.sources.TableIO.writeLshPlanes(spark, path, planes, 42L)

    AnnSearch.appendToLshIndex(spark, path, late)

    val appended = graft.sources.SnapshotTable.read(spark, path)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val rebuilt = AnnSearch.withLshBucket(all, "embedding", planes)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(appended == rebuilt, "append must equal full rebuild")

    // serve from the appended index == inline search on the full corpus
    val served = graft.sources.SnapshotTable.read(spark, path)
      .filter(col("lsh_bucket").isin(AnnSearch.probeBuckets(queryVec, planes): _*))
      .withColumn("sim", org.apache.spark.sql.functions.round(
        graft.functions.VectorFunctions.cosineSimilarity(
          col("embedding"),
          org.apache.spark.sql.functions.typedlit(queryVec.toSeq)), 6))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(r.fieldIndex("sim")))).toSeq
    val inline = AnnSearch.lshSearch(all, "embedding", "vec_id", queryVec)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(served == inline)

    // IVF twin: frozen quantizer, assignment parity with the build path
    val (ivfAssigned, centroids) = AnnSearch.buildIvf(initial, "embedding")
    val ivfPath = java.nio.file.Files.createTempDirectory("ann_append").toString + "/ivf"
    graft.sources.TableIO.writeAnnIndex(ivfAssigned, ivfPath, "ivf_list")
    graft.sources.TableIO.writeIvfCentroids(spark, ivfPath, centroids)
    AnnSearch.appendToIvfIndex(spark, ivfPath, late)
    val total = graft.sources.SnapshotTable.read(spark, ivfPath).count()
    assert(total == all.count(), "every vector lands in exactly one list")
    // appended rows sit in their nearest list
    val lateAssign = graft.sources.SnapshotTable.read(spark, ivfPath)
      .join(late.select(col("vec_id")), "vec_id")
      .select("vec_id", "ivf_list").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    late.select("vec_id", "embedding").collect().foreach { r =>
      val want = AnnSearch.nearestLists(
        r.getSeq[Float](1).toArray, centroids, 1).head
      assert(lateAssign(r.getLong(0)) == want)
    }
  }

  test("q_ann_batch_ivf: one pruned scan serves the whole query batch; " +
    "per-query results match the single-query IVF search") {
    val batch = AnnSearch.batchIvfQuery(spark, sfDir)
    val rows = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // plan: ONE manifest-pruned index scan + broadcast probe table
    val (ivfPath, _) = AnnSearch.ensureIvfIndex(spark, sfDir)
    val totalFiles = graft.sources.SnapshotTable.readManifest(spark, ivfPath,
      graft.sources.SnapshotTable.currentVersion(spark, ivfPath)).size
    assert(batch.inputFiles.length < totalFiles,
      s"pruned scan expected: planned ${batch.inputFiles.length} of $totalFiles files")
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "probe table must broadcast")
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1,
      s"the index must be scanned once for the whole batch:\n$finalPlan")
    // parity: each query's top-3 equals the single-query IVF search on the
    // same persisted index with self-matches excluded
    val (path, centroids) = AnnSearch.ensureIvfIndex(spark, sfDir)
    rows.groupBy(_._1).foreach { case (qid, got) =>
      val qv = Tables.embeddings(spark, sfDir).filter(s"vec_id = $qid")
        .select("embedding").head().getSeq[Float](0).toArray
      val expected = AnnSearch.ivfSearch(
          graft.sources.SnapshotTable.read(spark, path)
            .filter(s"vec_id <> $qid"), centroids,
          "embedding", "vec_id", qv, topK = 3, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(got.sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq == expected,
        s"query $qid mismatch")
    }
  }

  test("incremental append rejects duplicate ids with a clear error; " +
    "index row count unchanged") {
    val all = corpus
    val initial = all.filter(col("vec_id") % 5 =!= 0)
    val late = all.filter(col("vec_id") % 5 === 0)
    val planes = AnnSearch.hyperplanes(4, 64, 42L)
    val path = java.nio.file.Files.createTempDirectory("ann_dup").toString + "/lsh"
    graft.sources.TableIO.writeAnnIndex(
      AnnSearch.withLshBucket(initial, "embedding", planes), path, "lsh_bucket")
    graft.sources.TableIO.writeLshPlanes(spark, path, planes, 42L)

    AnnSearch.appendToLshIndex(spark, path, late)
    val n1 = graft.sources.SnapshotTable.read(spark, path).count()
    assert(n1 == all.count())

    // re-appending the same batch must fail loudly, not silently duplicate
    val ex = intercept[IllegalArgumentException] {
      AnnSearch.appendToLshIndex(spark, path, late)
    }
    assert(ex.getMessage.contains("duplicate"), ex.getMessage)
    assert(graft.sources.SnapshotTable.read(spark, path).count() == n1,
      "failed append must not write")

    // a batch with internal duplicates is rejected before touching the index
    val freshPath = java.nio.file.Files.createTempDirectory("ann_dup").toString + "/lsh2"
    graft.sources.TableIO.writeAnnIndex(
      AnnSearch.withLshBucket(initial, "embedding", planes), freshPath, "lsh_bucket")
    graft.sources.TableIO.writeLshPlanes(spark, freshPath, planes, 42L)
    val ex2 = intercept[IllegalArgumentException] {
      AnnSearch.appendToLshIndex(spark, freshPath, late.union(late))
    }
    assert(ex2.getMessage.contains("within itself"), ex2.getMessage)
  }

  test("compactAnnIndex bounds files per bucket and preserves contents") {
    val all = corpus
    val planes = AnnSearch.hyperplanes(4, 64, 42L)
    val path = java.nio.file.Files.createTempDirectory("ann_compact").toString + "/lsh"
    // initial build + 3 appends → several small files per touched bucket
    graft.sources.TableIO.writeAnnIndex(
      AnnSearch.withLshBucket(all.filter(col("vec_id") % 4 === 1), "embedding", planes),
      path, "lsh_bucket")
    graft.sources.TableIO.writeLshPlanes(spark, path, planes, 42L)
    Seq(2, 3, 0).foreach { m =>
      AnnSearch.appendToLshIndex(spark, path, all.filter(col("vec_id") % 4 === m))
    }
    val before = graft.sources.SnapshotTable.read(spark, path)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

    def filesPerBucket: Map[String, Int] =
      graft.sources.SnapshotTable.readManifest(spark, path,
        graft.sources.SnapshotTable.currentVersion(spark, path))
        .groupBy(_.parts.get.head).view.mapValues(_.size).toMap
    assert(filesPerBucket.values.exists(_ > 1),
      "appends should have produced multiple files in at least one bucket")

    graft.sources.TableIO.compactAnnIndex(spark, path, "lsh_bucket")

    assert(filesPerBucket.values.forall(_ == 1),
      s"every bucket must collapse to one file after compact: $filesPerBucket")
    val after = graft.sources.SnapshotTable.read(spark, path)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == before, "compaction must not change index contents")
    // the planes sidecar survives the maintenance commit untouched
    val back = graft.sources.TableIO.readLshPlanes(spark, path)
    planes.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("LSH planes round-trip through the persisted sidecar") {
    val (path, planes) = AnnSearch.ensureLshIndex(spark, sfDir)
    val back = graft.sources.TableIO.readLshPlanes(spark, path)
    assert(back.length == planes.length)
    planes.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("q_ann_neardup: IVF-blocked pairs are a subset of the exact truth " +
    "(no false positives), with measured recall above floor") {
    val found = AnnSearch.ivfNearDupQuery(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs truth at spec scale
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0
      else math.round(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val truth = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cos(va, vb) >= 0.4
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty)
    assert(found.subsetOf(truth),
      s"blocked pairs must be exact within lists: ${found.diff(truth)}")
    val recall = found.size.toDouble / truth.size
    // SemDeDup's stated trade: cross-list pairs are missed. The floor pins
    // the block assignment staying useful, not perfection.
    assert(recall >= 0.2, s"recall $recall (${found.size}/${truth.size})")
  }

  test("q_ann_recall: LSH recall is oracle-exact; IVF recall above floor") {
    val row = AnnSearch.annRecallQuery(spark, sfDir).head()
    assert(row.getAs[Long]("n_brute") == 10)
    assert(row.getAs[Long]("lsh_candidates") < row.getAs[Long]("n_corpus"),
      "bucketing must prune")
    // 4-plane/5-probe LSH recall on the driver corpora ranges 0.3–0.6 —
    // the report's job is to SURFACE the number (oracle recomputes it
    // exactly); the spec only pins a sanity floor.
    val lshRecall = row.getAs[Double]("lsh_recall")
    assert(lshRecall >= 0.3, s"LSH recall@10 = $lshRecall")
    assert(row.getAs[Boolean]("ivf_recall_ge_half"), "IVF recall@10 must be >= 0.5")
  }

  test("q_ann_ivf serves from the persisted list-partitioned index: " +
    "partition-pruned scan, no k-means fit in the query") {
    val before = AnnSearch.ivfBuildCount.get()
    val first = AnnSearch.ivfQuery(spark, sfDir)
    assert(first.count() == 10)
    val second = AnnSearch.ivfQuery(spark, sfDir)
    assert(second.count() == 10)
    assert(AnnSearch.ivfBuildCount.get() <= before + 1,
      "index must be built at most once across repeated queries")
    // the nprobe list set prunes at the MANIFEST — nprobe lists' files
    // planned, not the corpus
    val (path, _) = AnnSearch.ensureIvfIndex(spark, sfDir)
    val total = graft.sources.SnapshotTable.readManifest(spark, path,
      graft.sources.SnapshotTable.currentVersion(spark, path)).size
    assert(second.inputFiles.length < total,
      s"pruned scan expected: planned ${second.inputFiles.length} of $total files")
  }
}
