package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` INCREMENTAL near-duplicate detection against a persisted band
  * store — the production dedup shape the batch and streaming paths both
  * miss: [[MinHashDedup]] re-bands the whole corpus every run, and
  * [[graft.streaming.DocDedupStream]] dedups within one stream. A
  * continuously-ingesting pipeline instead keeps the LSH postings
  * (band_id, bucket, doc_id) AT REST beside the corpus (the
  * [[graft.sources.TableIO]] sidecar pattern) and, per new batch:
  *
  *  1. bands ONLY the batch (one narrow signature pass over new docs —
  *     history is never re-scanned, let alone re-hashed);
  *  2. candidates = batch-bands ⋈ store (old×new) ∪ batch-bands local
  *     pair emission (new×new), with the SAME occupancy cap as the batch
  *     path, applied to the COMBINED (store + batch) bucket size;
  *  3. the same signature-agreement prefilter and exact word-set verify
  *     as [[MinHashDedup.nearDupPairs]] — old texts are read only for
  *     the candidate ids (a semi-join against the corpus, partition/
  *     predicate-prunable at rest);
  *  4. [[absorbBatch]] appends the batch's postings, so the store after
  *     N batches equals a from-scratch rebuild (spec-asserted) and the
  *     next batch sees this one as history.
  *
  * EQUIVALENCE (the oracle's closed form): because a full-corpus run's
  * candidate set is "pairs sharing ≥1 band bucket", restricting it to
  * pairs touching the batch yields exactly step 2's union — old×old
  * pairs are the only ones excluded. Prefilter and verify are per-pair,
  * so `dedupNewBatch(old-store, batch) ≡ nearDupPairs(old ∪ batch)
  * restricted to pairs with an endpoint in the batch` — which is what
  * the driver oracle checks, hash-exact.
  *
  * Scale shape: the store is one 20-byte row per (doc, band) — 16 rows
  * per document regardless of size — partitioned like any fact table;
  * the candidate join keys on (band_id, bucket) and carries ids only;
  * batch-sized legs (bands, signatures, word sets of candidates) are
  * the only per-run compute. History cost: zero scans, one postings
  * append.
  */
object IncrementalDedup extends QueryPack {

  import MinHashDedup.{bandKeys, defaultMaxBucketSize, withSignature, numHashes}

  /** Write (or overwrite) the band store for a corpus slice. */
  def writeBandStore(docs: DataFrame, path: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     seed: Long = 42L): Unit =
    bandKeys(docs, idCol, textCol, seed)
      .select(col("band_id"), col("bucket"), col("id").as("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Append a processed batch's postings — after this the store equals a
    * from-scratch [[writeBandStore]] over history ∪ batch (spec-asserted),
    * and the next batch sees this one as history. Dynamic append: only
    * new files land, existing postings are never rewritten.
    */
  def absorbBatch(batch: DataFrame, path: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  seed: Long = 42L,
                  mode: SaveMode = SaveMode.Append): Unit =
    bandKeys(batch, idCol, textCol, seed)
      .select(col("band_id"), col("bucket"), col("id").as("doc_id"))
      .write.mode(mode).parquet(path)

  /** Batch ids of the `batch_id=N` subdirectories under `dir` (any
    * Hadoop scheme — the probe goes through the `FileSystem` API, not
    * `java.nio`). Empty when the directory does not exist yet.
    */
  def listBatchIds(spark: SparkSession, dir: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
  }

  /** COMPACTION for a `batch_id=N`-scoped state directory (the
    * [[graft.streaming.IncrDedupStream]] layout) — the
    * [[graft.sources.TableIO.compactAnnIndex]] maintenance op for the
    * band store: fold every `batch_id=N` directory with `N ≤ upTo` into
    * ONE `batch_id=<max folded id>` directory, so a week of 1-minute
    * micro-batches does not leave ~10k directories of tiny postings
    * files for every later `dedupNewBatch` listing to pay for. The fold
    * preserves rebuild equality (same rows, relabeled partitions) and
    * retry semantics: a later batch M > upTo still selects the folded
    * data via `batch_id < M`, and `upTo` must come from the stream's
    * COMMITTED watermark (see [[graft.streaming.IncrDedupStream
    * .compactState]]) so an uncommitted batch is never folded under an
    * id it could be retried against.
    *
    * Swap discipline (all renames, any Hadoop scheme): write the fold to
    * a sibling `__compacting` dir; park each folded `batch_id=N` into a
    * sibling `__precompact`; rename the fold into place; delete the
    * parked originals. A crash at any point is healed by
    * [[recoverCompactLeftovers]] (run first here and by the stream):
    * `__compacting` still present → roll BACK (restore parked dirs,
    * drop the fold); only `__precompact` left → roll FORWARD (the fold
    * is live; drop the parked originals).
    */
  def compactBatchDirs(spark: SparkSession, dir: String, upTo: Long,
                       minDirs: Int = 2): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompactLeftovers(spark, dir)
    val ids = listBatchIds(spark, dir).filter(_ <= upTo).sorted
    if (ids.size < math.max(2, minDirs)) return
    val target = ids.max
    val tmp = new Path(dir.stripSuffix("/") + "__compacting")
    val parked = new Path(dir.stripSuffix("/") + "__precompact")
    val folded =
      try spark.read.parquet(dir)
        .filter(col("batch_id") <= upTo).drop("batch_id")
      catch {
        // every folded dir empty (zero-pair results batches write only
        // _SUCCESS) — nothing to fold; tiny empty dirs are harmless
        case e: org.apache.spark.sql.AnalysisException
            if isEmptyReadCondition(e) => return
      }
    folded.coalesce(math.max(1, ids.size / 8)).write
      .mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.mkdirs(parked)
    for (id <- ids) {
      val d = new Path(root, s"batch_id=$id")
      require(fs.rename(d, new Path(parked, s"batch_id=$id")),
        s"compact: could not park $d")
    }
    require(fs.rename(tmp, new Path(root, s"batch_id=$target")),
      s"compact: could not move $tmp into place")
    fs.delete(parked, true)
  }

  /** Heal a crashed [[compactBatchDirs]] swap — see its scaladoc. */
  def recoverCompactLeftovers(spark: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.stripSuffix("/") + "__compacting")
    val parked = new Path(dir.stripSuffix("/") + "__precompact")
    if (fs.exists(tmp)) {
      // crashed BEFORE the fold went live: restore any parked originals
      // whose live dir is missing, then drop the incomplete fold
      if (fs.exists(parked))
        for (st <- fs.listStatus(parked) if st.isDirectory) {
          val live = new Path(root, st.getPath.getName)
          if (!fs.exists(live))
            require(fs.rename(st.getPath, live),
              s"compact recovery: could not restore ${st.getPath}")
        }
      fs.delete(parked, true)
      fs.delete(tmp, true)
    } else if (fs.exists(parked)) {
      // fold is live; the parked originals are superseded
      fs.delete(parked, true)
    }
  }

  /** True for the error conditions an empty/absent parquet read raises. */
  private[graft] def isEmptyReadCondition(
      e: org.apache.spark.sql.AnalysisException): Boolean =
    Option(e.getCondition).exists(c =>
      c.startsWith("UNABLE_TO_INFER_SCHEMA") || c.startsWith("PATH_NOT_FOUND"))

  /** Near-dup pairs (a_id, b_id, jac ≥ threshold) touching the new batch:
    * batch×history via the persisted store at `storePath` plus
    * batch×batch, verified exactly. `corpus` supplies historical TEXTS
    * for the candidate verify only (semi-joined down to candidate ids) —
    * it is never banded or signature-hashed beyond those candidates.
    */
  def dedupNewBatch(corpus: DataFrame, storePath: String, batch: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    threshold: Double = 0.8, seed: Long = 42L,
                    maxBucketSize: Int = defaultMaxBucketSize,
                    sigAgreementMargin: Option[Double] = Some(0.35)): DataFrame =
    dedupAgainstStore(corpus, batch.sparkSession.read.parquet(storePath),
      batch, idCol, textCol, threshold, seed, maxBucketSize, sigAgreementMargin)

  /** [[dedupNewBatch]] with the band store supplied as a DataFrame — the
    * streaming front-end passes the `batch_id`-partitioned store FILTERED
    * to `batch_id < current` here, so a re-delivered micro-batch never
    * sees its own prior attempt's postings. Defensive even so: the cross
    * leg drops `id = old_id` self-pairs and `touched` is deduplicated on
    * the id column, so a store/batch overlap (a caller re-absorbing a
    * batch) degrades to duplicate work rather than corrupt output
    * (self-pairs at jac 1.0, doubled verify rows).
    */
  def dedupAgainstStore(corpus: DataFrame, bandStore: DataFrame, batch: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        threshold: Double = 0.8, seed: Long = 42L,
                        maxBucketSize: Int = defaultMaxBucketSize,
                        sigAgreementMargin: Option[Double] = Some(0.35)): DataFrame = {
    MinHashDedup.requireLongId(batch, idCol)
    val spark = batch.sparkSession
    val droppedBuckets = spark.sparkContext.longAccumulator(MinHashDedup.droppedBucketsAcc)
    val droppedSlots = spark.sparkContext.longAccumulator(MinHashDedup.droppedDocSlotsAcc)

    val store = bandStore.select(col("band_id"), col("bucket"), col("doc_id"))
    // batch banded ONCE, reused by cross pairs, intra pairs, and occupancy
    val bb = bandKeys(batch, idCol, textCol, seed)
      .select(col("band_id"), col("bucket"), col("id"))
      .localCheckpoint(eager = false)

    // combined occupancy per bucket — the cap must see what the full-run
    // bucket would hold (store + batch), or a hot bucket that the batch
    // path refuses would slip through the incremental path
    val occ = store.groupBy(col("band_id"), col("bucket"))
      .agg(count(lit(1)).as("n_old"))
      .join(bb.groupBy(col("band_id"), col("bucket")).agg(count(lit(1)).as("n_new")),
        Seq("band_id", "bucket"), "full_outer")
      .select(col("band_id"), col("bucket"),
        (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L))).as("n_tot"))

    // cap accounting rides one UDF evaluated exactly once per bucket (no
    // Or-expression: Catalyst does not promise short-circuit order, and a
    // side-effecting branch must not run per evaluation whim); the
    // checkpoint stops the two candidate legs from cloning this subtree
    // and double-counting the accumulators
    val admit = udf { (n: Long) =>
      if (n > maxBucketSize) { droppedBuckets.add(1); droppedSlots.add(n); false }
      else true
    }
    val okBuckets = occ.filter(admit(col("n_tot")))
      .select(col("band_id"), col("bucket"))
      .localCheckpoint(eager = false)

    val cross = bb.join(okBuckets, Seq("band_id", "bucket"), "left_semi")
      .join(store.select(col("band_id"), col("bucket"), col("doc_id").as("old_id")),
        Seq("band_id", "bucket"))
      .filter(col("id") =!= col("old_id")) // store/batch overlap ≠ a pair
      .select(least(col("id"), col("old_id")).as("a_id"),
        greatest(col("id"), col("old_id")).as("b_id"))
    val intra = bb.join(okBuckets, Seq("band_id", "bucket"), "left_semi")
      .groupBy(col("band_id"), col("bucket")).agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(least(x, y) AS a, greatest(x, y) AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
    val candidates = cross.union(intra).distinct()

    // texts of every candidate endpoint: batch texts + ONLY the touched
    // slice of history (left-semi keeps the scan prunable at rest)
    val cand = candidates.localCheckpoint(eager = false)
    val candIds = cand.select(col("a_id").as("cid"))
      .union(cand.select(col("b_id"))).distinct()
    // anti-join, not dropDuplicates: an id present in BOTH corpus and
    // batch (overlap) must contribute one text row, not two join matches
    // per pair — and the batch id list broadcasts where a global
    // dropDuplicates would shuffle every candidate text
    val touched = corpus.select(col(idCol), col(textCol))
      .join(candIds, col(idCol) === col("cid"), "left_semi")
      .join(batch.select(col(idCol)), Seq(idCol), "left_anti")
      .union(batch.select(col(idCol), col(textCol)))

    val prefiltered = sigAgreementMargin match {
      case None => cand
      case Some(margin) =>
        val estMin = math.max(0.0, threshold - margin)
        val sigs = withSignature(touched, textCol, seed)
          .select(col(idCol).as("id"), col("minhash_sig"))
        cand
          .join(sigs.select(col("id").as("a_id"), col("minhash_sig").as("a_sig")), "a_id")
          .join(sigs.select(col("id").as("b_id"), col("minhash_sig").as("b_sig")), "b_id")
          .withColumn("est",
            aggregate(zip_with(col("a_sig"), col("b_sig"),
                (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (acc, m) => acc + m).cast("double") / numHashes)
          .filter(col("est") >= estMin)
          .select("a_id", "b_id")
    }

    val ws = touched.select(col(idCol).as("id"),
      array_distinct(split(col(textCol), " ")).as("ws"))
    prefiltered
      .join(ws.select(col("id").as("a_id"), col("ws").as("a_ws")), "a_id")
      .join(ws.select(col("id").as("b_id"), col("ws").as("b_ws")), "b_id")
      .withColumn("jac",
        round(size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
              size(array_union(col("a_ws"), col("b_ws"))).cast("double"), 6))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Deterministic 1-in-10 "new batch" split of the documents corpus
    * (md5(doc_id) % 10 = 7 — the q_prefix_jaccard sampling pattern), so
    * the oracle can reproduce the exact same split.
    */
  private[graft] def isBatch = conv(substring(
    md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
    .cast("long") % 10 === 7

  /** Build-once band store of the HISTORY slice per corpus dir (atomic
    * staging — the [[graft.sources.Ingest.ensureStaged]] contract).
    */
  private[operators] def ensureHistoryStore(s: SparkSession, dir: String): String =
    graft.sources.Ingest.ensureStaged(
      graft.sources.Ingest.stagedPath(s, "graft_bandstore_",
        Seq(s"$dir/documents.parquet"))) { tmp =>
      writeBandStore(Tables.documents(s, dir).filter(!isBatch), tmp)
    }

  /** Driver query: the md5-split batch deduped against the persisted
    * history store. Oracle = the FULL-corpus minhash pipeline restricted
    * to pairs touching the batch — the equivalence the scaladoc argues,
    * checked hash-exact.
    */
  def incrNeardupQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // the staged history store is write-once per corpus — resolve it
    // through the reader memo instead of dedupNewBatch's per-run
    // schema-inferring read (a footer-merge job + driver resolution
    // per invocation for a fixed three-column layout)
    dedupAgainstStore(docs.filter(!isBatch),
      graft.Tables.readCached(s, ensureHistoryStore(s, dir)),
      docs.filter(isBatch))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_incr_neardup" -> (incrNeardupQuery _))

  /** The full-run pair oracle with a touching-the-batch restriction —
    * DuckDB's md5 split matches [[isBatch]] exactly.
    */
  override def oracleSql: Map[String, String] = Map(
    "q_incr_neardup" -> {
      def inBatch(c: String) =
        s"CAST(concat('0x', substring(md5($c::VARCHAR), 1, 8)) AS BIGINT) % 10 = 7"
      s"""SELECT a_id, b_id, jac FROM (
         |${MinHashDedup.minhashNeardupOracle}
         |) t
         |WHERE ${inBatch("a_id")} OR ${inBatch("b_id")}
         |ORDER BY a_id, b_id""".stripMargin
    })
}
