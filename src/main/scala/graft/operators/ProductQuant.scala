package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Product quantization (Jégou/Douze/Schmid, PAMI 2011) — the compression
  * half of IVF-PQ and the standard way a 100 TB embedding fleet fits in
  * serving memory: each vector is split into M subvectors, each subvector
  * replaced by the id of its nearest sub-centroid from a per-subspace
  * codebook. With M=8 subspaces × K=16 centroids a 64-dim float32 vector
  * (256 bytes) becomes 8 4-bit codes — 4 bytes when packed, 64×
  * compression — and queries run by ASYMMETRIC DISTANCE COMPUTATION: the
  * query precomputes an M×K lookup table of sub-dot-products once, then
  * scoring a corpus vector is M table lookups + adds, never touching a
  * float vector.
  *
  * Spark shape: codebook training is M seeded k-means fits on the PINNED
  * single-sorted-partition corpus (the [[AnnSearch.ensureIvfIndex]]
  * determinism recipe — a bounded-sample offline fit in real deployments);
  * encoding is one scan with a pure per-row UDF; the CODES table (id +
  * tinyint array) is what persists and what serving scans — column-pruned,
  * 4 bytes of payload per row. The ADC scorer is a per-row HOF chain
  * (indexed-transform lookups into the broadcast-literal tables + a
  * sequential fold), so the serve plan is scan → scalar math →
  * TakeOrderedAndProject with no shuffle and no raw embeddings read.
  *
  * Oracle: the fit is not SQL-expressible, but (pinned fit + pure per-row
  * encode + sequential ADC fold) is a bit-deterministic function of the
  * corpus, so `q_ann_pq` carries a GOLDEN-VALUE oracle captured at the
  * driver's verify corpus (sf0.01) and cross-checked across fresh JVMs at
  * local[4]/local[32] (graft.GoldenIvf probe) — the q_ann_ivf recipe.
  */
object ProductQuant extends QueryPack {

  val M = 8
  val K = 16
  private val Dim = 64
  private val DSub = Dim / M

  /** Per-subspace codebooks fit on the pinned corpus: Array[M][K][DSub].
    * Seeds are `seed + j` so subspaces train independent codebooks.
    */
  def buildCodebooks(corpus: DataFrame, embCol: String,
                     seed: Long = 42L): Array[Array[Array[Double]]] = {
    val cached = corpus.cache()
    val books = (0 until M).map { j =>
      val lo = j * DSub
      val toSub = udf { (v: Seq[Float]) =>
        Vectors.dense(v.slice(lo, lo + DSub).map(_.toDouble).toArray)
      }
      val sub = cached.withColumn("__sv", toSub(col(embCol)))
      new KMeans().setK(K).setSeed(seed + j).setMaxIter(5)
        .setFeaturesCol("__sv").setPredictionCol("__c")
        .fit(sub).clusterCenters.map(_.toArray)
    }.toArray
    cached.unpersist()
    books
  }

  /** Pure per-row encoder: nearest sub-centroid id (L2², ties → lowest
    * id) per subspace. Returns M bytes.
    */
  private[operators] def encode(v: Seq[Float],
                                books: Array[Array[Array[Double]]]): Seq[Byte] =
    (0 until M).map { j =>
      val lo = j * DSub
      var best = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < K) {
        val c = books(j)(i)
        var d = 0.0
        var t = 0
        while (t < DSub) { val e = v(lo + t) - c(t); d += e * e; t += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best.toByte
    }

  private val pqBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Array[Array[Double]]])]()
  private[operators] val pqBuildCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private def indexPath(dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_pq_$digest").getAbsolutePath
  }

  /** Ensure the persisted codes table + codebook sidecar exist for `dir`;
    * returns (codes path, codebooks). One fit + one encode scan per
    * corpus per process; serving only reads.
    */
  def ensurePqIndex(s: SparkSession, dir: String): (String, Array[Array[Array[Double]]]) =
    pqBuilt.computeIfAbsent(dir, { _ =>
      pqBuildCount.incrementAndGet()
      val corpus = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      val dim = corpus.select(col("embedding")).head().getSeq[Float](0).length
      require(dim == Dim,
        s"ensurePqIndex serves the driver corpus contract (dim=$Dim); got $dim")
      val pinned = corpus.coalesce(1).sortWithinPartitions("vec_id")
      val books = buildCodebooks(pinned, "embedding")
      val enc = udf { (v: Seq[Float]) => encode(v, books) }
      val path = indexPath(dir)
      corpus.select(col("vec_id"), enc(col("embedding")).as("pq_codes"))
        .write.mode("overwrite").parquet(path)
      graft.sources.TableIO.writePqCodebooks(s, path, books)
      (path, books)
    })

  /** ADC top-10 against the persisted codes table. The query-side M×K
    * dot and norm² tables are driver-computed doubles shipped as flat
    * 128-element literals; per-row scoring is two indexed-transform
    * lookups + sequential folds.
    */
  def pqQuery(s: SparkSession, dir: String): DataFrame = {
    val (path, books) = ensurePqIndex(s, dir)
    pqQueryPool(s, dir, path, books, 10)
  }

  /** Two-stage serving — the production pattern PQ exists for: stage 1
    * scans only the 4-byte codes and keeps a candidate pool (top-50 by
    * ADC score); stage 2 reads RAW embeddings for just those ≤50 ids
    * (broadcast semi-join into the embeddings scan) and re-ranks them
    * exactly. Full-precision quality at compressed-scan cost: the raw
    * vector read is O(candidates), never O(corpus).
    */
  def pqRerankQuery(s: SparkSession, dir: String, pool: Int = 50,
                    topK: Int = 10): DataFrame = {
    val (path, books) = ensurePqIndex(s, dir)
    val qDf = broadcast(Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb")))
    val candidates = pqQueryPool(s, dir, path, books, pool)
      .select(col("vec_id"), col("sim_pq"))
    Tables.embeddings(s, dir)
      .join(broadcast(candidates), "vec_id")
      .crossJoin(qDf)
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.cosineSimilarity(
          col("embedding"), col("q_emb")), 6).as("sim"),
        col("sim_pq"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** Stage-1 candidate pool (ADC top-`pool` over the codes table). */
  private def pqQueryPool(s: SparkSession, dir: String, path: String,
                          books: Array[Array[Array[Double]]], pool: Int): DataFrame = {
    val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    def subDot(j: Int, c: Array[Double]): Double = {
      var d = 0.0
      var t = 0
      while (t < DSub) { d += q(j * DSub + t).toDouble * c(t); t += 1 }
      d
    }
    val dotLit = typedlit(
      for (j <- 0 until M; i <- 0 until K) yield subDot(j, books(j)(i)))
    val normLit = typedlit(
      for (j <- 0 until M; i <- 0 until K) yield books(j)(i).map(x => x * x).sum)
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    def lookupSum(table: org.apache.spark.sql.Column) =
      aggregate(
        transform(col("pq_codes"),
          (c, j) => element_at(table, j * K + c.cast("int") + 1)),
        lit(0.0), (acc, x) => acc + x)
    graft.Tables.readCached(s, path)
      .withColumn("adot", lookupSum(dotLit))
      .withColumn("anorm2", lookupSum(normLit))
      .select(col("vec_id"),
        round(col("adot") / (lit(qNorm) * sqrt(col("anorm2"))), 6).as("sim_pq"))
      .orderBy(col("sim_pq").desc, col("vec_id"))
      .limit(pool)
  }

  private val ivfPqBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Array[Double]], Array[Array[Array[Double]]])]()

  /** Composed IVF-PQ layout — the FAISS-IVFPQ serving shape at 100 TB:
    * the coarse quantizer routes (partition pruning on `ivf_list`), the
    * PQ codes are the only payload scanned within probed lists. Built by
    * joining the two existing persisted artifacts (IVF assignments + PQ
    * codes) and re-partitioning by list; both underlying builds are the
    * pinned deterministic fits. This is the NON-residual variant (codes
    * quantize raw vectors, not x − centroid); residual encoding is the
    * standard refinement when nLists grows — noted, not needed for the
    * routing+compression shape this demonstrates.
    */
  def ensureIvfPqIndex(s: SparkSession, dir: String): (String, Array[Array[Double]], Array[Array[Array[Double]]]) =
    ivfPqBuilt.computeIfAbsent(dir, { _ =>
      val (ivfPath, centroids) = AnnSearch.ensureIvfIndex(s, dir)
      val (pqPath, books) = ensurePqIndex(s, dir)
      val path = indexPath(dir) + "_ivf"
      graft.sources.SnapshotTable.read(s, ivfPath)
        .select(col("vec_id"), col("ivf_list"))
        .join(s.read.parquet(pqPath), "vec_id")
        .write.mode("overwrite").partitionBy("ivf_list").parquet(path)
      (path, centroids, books)
    })

  /** IVF-PQ serve: route to nprobe lists (partition-pruned scan of the
    * composed codes layout), ADC-score the ~nprobe/nLists fraction of
    * codes, keep a pool, re-rank the pool exactly from raw embeddings.
    * Scan cost at 100 TB: (nprobe/nLists) × 4 bytes/vector, plus
    * O(pool) raw reads.
    */
  def ivfPqQuery(s: SparkSession, dir: String, nprobe: Int = 4,
                 pool: Int = 50, topK: Int = 10): DataFrame = {
    val (path, centroids, books) = ensureIvfPqIndex(s, dir)
    val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lists = AnnSearch.nearestLists(q, centroids, nprobe)
    def subDot(j: Int, c: Array[Double]): Double = {
      var d = 0.0
      var t = 0
      while (t < DSub) { d += q(j * DSub + t).toDouble * c(t); t += 1 }
      d
    }
    val dotLit = typedlit(
      for (j <- 0 until M; i <- 0 until K) yield subDot(j, books(j)(i)))
    val normLit = typedlit(
      for (j <- 0 until M; i <- 0 until K) yield books(j)(i).map(x => x * x).sum)
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    def lookupSum(table: org.apache.spark.sql.Column) =
      aggregate(
        transform(col("pq_codes"),
          (c, j) => element_at(table, j * K + c.cast("int") + 1)),
        lit(0.0), (acc, x) => acc + x)
    val candidates = graft.Tables.readCached(s, path)
      .filter(col("ivf_list").isin(lists: _*))
      .withColumn("adot", lookupSum(dotLit))
      .withColumn("anorm2", lookupSum(normLit))
      .select(col("vec_id"), col("ivf_list"),
        round(col("adot") / (lit(qNorm) * sqrt(col("anorm2"))), 6).as("sim_pq"))
      .orderBy(col("sim_pq").desc, col("vec_id"))
      .limit(pool)
    val qDf = broadcast(Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb")))
    Tables.embeddings(s, dir)
      .join(broadcast(candidates), "vec_id")
      .crossJoin(qDf)
      .select(col("vec_id"), col("ivf_list").cast("int").as("ivf_list"),
        round(graft.functions.VectorFunctions.cosineSimilarity(
          col("embedding"), col("q_emb")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** Compression-tier quality report: recall@10 vs the exact brute-force
    * ranking for every compressed serving path, one driver-visible row
    * (the q_ann_recall pattern extended to the compression family). The
    * four top-k lists are k-sized driver collects — the report costs four
    * index probes, not corpus scans.
    */
  def compressionRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    // the five top-k probes are independent k-row collects whose cost is
    // almost entirely job latency, not compute — run them concurrently so
    // the report pays ONE probe's latency, not five in sequence (each
    // probe's own result is unchanged; the Spark scheduler interleaves
    // the jobs). The index builds they depend on are memoized before the
    // fan-out so no build races itself.
    ensurePqIndex(s, dir)
    ensureIvfPqIndex(s, dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // generous FINITE deadline shared by all probes (ADVICE r13: an
    // Inf await on a hung job blocks the query forever); on timeout or
    // a probe failure, cancel the group's outstanding jobs so no
    // detached work keeps burning the shared session
    val group = s"pq-recall-${java.util.UUID.randomUUID()}"
    def probe(f: => Set[Long]): Future[Set[Long]] = Future {
      s.sparkContext.setJobGroup(group, "compressionRecall probe",
        interruptOnCancel = true)
      try f finally s.sparkContext.clearJobGroup()
    }
    val probes = Seq(
      probe(ids(graft.search.VectorSearch.knnBrute(s, dir))),
      probe(ids(graft.search.QuantizedSearch.sqTopK(s, dir))),
      probe(ids(pqQuery(s, dir))),
      probe(ids(pqRerankQuery(s, dir))),
      probe(ids(ivfPqQuery(s, dir))))
    val Seq(exact, sq, pq, pqr, ivfpq) =
      try probes.map(Await.result(_, Duration(10, "min")))
      catch { case e: Throwable =>
        s.sparkContext.cancelJobGroup(group)
        throw e
      }
    def recall(got: Set[Long]): Double = (got & exact).size / 10.0
    Seq((recall(sq), recall(pq), recall(pqr), recall(ivfpq), 8L, 256L))
      .toDF("sq8_recall_at10", "pq_recall_at10", "pq_rerank_recall_at10",
        "ivfpq_recall_at10", "pq_bytes_per_vec", "raw_bytes_per_vec")
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_ann_pq"        -> (pqQuery _),
    "q_ann_pq_rerank" -> ((s, d) => pqRerankQuery(s, d)),
    "q_ann_ivfpq"     -> ((s, d) => ivfPqQuery(s, d)),
    "q_compression_recall" -> (compressionRecall _))

  /** GOLDEN-VALUE oracle (sf0.01-specific, the q_ann_ivf recipe) —
    * captured from the pinned build and reproduced bit-identically
    * across fresh JVMs at local[4]/local[32] (GoldenIvf probe).
    */
  override def oracleSql: Map[String, String] = Map(
    "q_ann_pq"        -> PqGolden.sql,
    "q_ann_pq_rerank" -> PqGolden.rerankSql,
    "q_ann_ivfpq"     -> PqGolden.ivfPqSql,
    "q_compression_recall" -> PqGolden.recallSql)
}
