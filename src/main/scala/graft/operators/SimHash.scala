package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** SimHash near-duplicate fingerprinting (Charikar random-hyperplane
  * sketch over token features, as used for web-scale dedup in the Google
  * crawl-dedup line of work).
  *
  * 64-bit fingerprint: each token hashes to 64 bits; per bit position the
  * fingerprint accumulates +1/−1 by bit value; the sign vector is the
  * fingerprint. Near-dup ⇔ Hamming distance ≤ 3.
  *
  * Candidate generation at scale (pigeonhole): split the 64 bits into 4
  * chunks of 16; distance ≤ 3 ⇒ at least one chunk identical ⇒ join on
  * (chunk_id, chunk_value) buckets — like MinHash banding, the shuffle is
  * bucket-sized, never corpus². Verification = `bit_count(a ^ b)` — one
  * codegen'd expression, no UDF in the join path.
  */
object SimHash extends QueryPack {

  val hammingThreshold = 3
  private val chunks = hammingThreshold + 1 // pigeonhole: ≤3 diffs over 4 chunks
  private val chunkBits = 64 / chunks

  /** Pure JVM fingerprint of a token list (the kernel behind the
    * DataFrame UDF and the SQL-registered `simhash64`).
    */
  def fingerprintOf(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      // xxhash-free stable 64-bit string hash (FNV-1a), deterministic
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < t.length) { h ^= t.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) fp |= (1L << bit); bit += 1 }
    fp
  }

  /** Fingerprint UDF: token list → 64-bit simhash. */
  private val simhashUdf = udf { (tokens: Seq[String]) => fingerprintOf(tokens) }

  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash", simhashUdf(split(col(textCol), " ")))

  /** Default chunk-bucket occupancy cap; see [[graft.operators.MinHashDedup]]
    * for the rationale. A 16-bit chunk bucket above this size (boilerplate
    * corpora where thousands of docs share a fingerprint chunk) is dropped
    * and COUNTED — the pigeonhole completeness guarantee ("distance ≤ 3 ⇒
    * found") then holds for all pairs not entirely inside dropped buckets,
    * and the accumulators make the exception auditable rather than silent.
    */
  val defaultMaxBucketSize = 2000
  val droppedBucketsAcc = "graft.simhash.droppedBuckets"
  val droppedDocSlotsAcc = "graft.simhash.droppedDocSlots"

  /** Near-dup pairs: chunk-bucket grouping + local Hamming verification.
    *
    * One shuffle: (chunk_id, chunk_val, id, fp) groups per bucket; pairs
    * are emitted locally per bucket (never a bucket self-join) and the
    * Hamming check runs inside the emit, so only pairs already within
    * `maxDistance` reach the cross-chunk dedup shuffle. The fingerprint
    * is a single long, so carrying it into the bucket costs 8 bytes/slot
    * — unlike MinHash there is no payload-multiplication concern.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDistance: Int = hammingThreshold,
                   maxBucketSize: Int = defaultMaxBucketSize): DataFrame =
    nearDupPairsWithStats(docs, idCol, textCol, maxDistance, maxBucketSize)._1

  /** [[nearDupPairs]] plus ITS OWN drop accumulators — no shared global;
    * see [[DropStats]] for retry semantics.
    */
  def nearDupPairsWithStats(docs: DataFrame, idCol: String, textCol: String,
                            maxDistance: Int = hammingThreshold,
                            maxBucketSize: Int = defaultMaxBucketSize): (DataFrame, DropStats) = {
    MinHashDedup.requireLongId(docs, idCol)
    val spark = docs.sparkSession
    val droppedBuckets = spark.sparkContext.longAccumulator(droppedBucketsAcc)
    val droppedSlots = spark.sparkContext.longAccumulator(droppedDocSlotsAcc)

    val fps = withFingerprint(docs, textCol)
      .select(col(idCol).as("id"), col("simhash"))

    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk_id"),
        shiftrightunsigned(col("simhash"), c * chunkBits)
          .bitwiseAND(lit((1L << chunkBits) - 1)).as("chunk_val"))
    }
    val chunked = fps.withColumn("chunk", explode(array(chunkCols: _*)))
      .select(col("chunk.chunk_id"), col("chunk.chunk_val"),
        array(col("id"), col("simhash")).as("doc"))

    val emitVerified = udf { (ds: Seq[Seq[Long]]) =>
      if (ds.length > maxBucketSize) {
        droppedBuckets.add(1)
        droppedSlots.add(ds.length)
        Array.empty[(Long, Long, Int)]
      } else {
        val sorted = ds.map(r => (r(0), r(1))).sortBy(_._1)
        val out = Array.newBuilder[(Long, Long, Int)]
        var i = 0
        while (i < sorted.length) {
          var j = i + 1
          while (j < sorted.length) {
            val d = java.lang.Long.bitCount(sorted(i)._2 ^ sorted(j)._2)
            if (d <= maxDistance) out += ((sorted(i)._1, sorted(j)._1, d))
            j += 1
          }
          i += 1
        }
        out.result()
      }
    }

    val pairs = chunked
      .groupBy("chunk_id", "chunk_val").agg(collect_list("doc").as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(emitVerified(col("ds"))).as("p"))
      .select(col("p._1").as("a_id"), col("p._2").as("b_id"),
        col("p._3").as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))
    (pairs, DropStats(droppedBuckets, droppedSlots))
  }

  def simhashQuery(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(s, dir), "doc_id", "text")

  /** The banded pipeline on the RICH corpus, fingerprinting the DISTINCT
    * token set — raw-frequency simhash is dominated by the Zipf head
    * (`w1` alone is ~25% of every doc's tokens, so all fingerprints
    * collapse together: measured 82 607 of 124 750 pairs inside Hamming
    * ≤ 3), while the set fingerprint recovers the planted structure:
    * intra-group pairs at distance 0-10, cross-group centered ~20, and
    * the ≤ 3 threshold keeps 0.13% of all pairs (spread spec-asserted
    * in RichCorpusSpec). Deduplicating features before sketching is the
    * standard fix for head-domination. Oracle = the exact quadratic
    * recompute over the same distinct-token sets.
    */
  def simhashRichQuery(s: SparkSession, dir: String): DataFrame = {
    val setDocs = Tables.richDocumentsStaged(s, dir)
      .select(col("doc_id"),
        array_join(array_distinct(split(col("text"), " ")), " ").as("text"))
    nearDupPairs(setDocs, "doc_id", "text")
  }

  /** Driver-visible SimHash quality report (one row, every column
    * oracle-exact — DuckDB recomputes the full FNV/simhash pair set, see
    * [[oracleSql]]):
    *
    *  - `n_simhash_pairs`: Hamming ≤ 3 pairs the pipeline emits;
    *  - `n_multiset_pairs` / `n_found_multiset` / `multiset_complete`:
    *    simhash is TOKEN-ORDER-INVARIANT, so docs with equal token
    *    multisets MUST collide at distance 0 and pigeonhole-completeness
    *    MUST surface them — `multiset_complete` goes false (and the row
    *    hash-mismatches) if the occupancy caps ever drop such a pair;
    *  - `n_word_pairs` / `n_sim_in_word` / `precision_vs_word`: the honest
    *    cross-measure vs the exact blocked word-set-Jaccard truth. On the
    *    driver corpora (tiny vocab, ~23-word docs) precision is ≈ 0.02:
    *    Hamming ≤ 3 here matches token FREQUENCY PROFILES, not word sets —
    *    this row surfaces that instead of implying the measures agree.
    */
  def qualityReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // the gate SCORES the pipeline's materialized outputs — the pair set
    // (one materialization of `q_simhash_neardup`, staged per corpus
    // fingerprint) and the staged word-set truth — rather than re-running
    // either per report, the way a corpus-snapshot QA job reads tables
    val pairs = {
      val p = graft.sources.Ingest.ensureStaged(
        graft.sources.Ingest.stagedPath(s, "graft_simhash_pairs_",
          Seq(s"$dir/documents.parquet"))) { tmp =>
        nearDupPairs(docs, "doc_id", "text").write.parquet(tmp)
      }
      graft.Tables.readCached(s, p)
    }
    // multiset key: md5 of the sorted token list — any deterministic sort
    // works, since only key EQUALITY (= multiset equality) is consumed
    val keyed = docs.select(col("doc_id"),
      md5(concat_ws(" ", array_sort(split(col("text"), " "))).cast("binary"))
        .as("mkey"))
    val word = TextAnalysis.ngramPairsStaged(s, dir).select("a_id", "b_id")

    val nPairsLeg = pairs.agg(count(lit(1)).as("n_simhash_pairs"))
    val msLeg = keyed.groupBy("mkey").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L))
        .as("n_multiset_pairs"))
    val foundMsLeg = pairs
      .join(keyed.select(col("doc_id").as("a_id"), col("mkey").as("a_key")), "a_id")
      .join(keyed.select(col("doc_id").as("b_id"), col("mkey").as("b_key")), "b_id")
      .filter(col("a_key") === col("b_key"))
      .agg(count(lit(1)).as("n_found_multiset"))
    val nWordLeg = word.agg(count(lit(1)).as("n_word_pairs"))
    val simInWordLeg = pairs.join(word, Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("n_sim_in_word"))

    nPairsLeg.crossJoin(msLeg).crossJoin(foundMsLeg)
      .crossJoin(nWordLeg).crossJoin(simInWordLeg)
      .select(col("n_simhash_pairs"), col("n_multiset_pairs"),
        col("n_found_multiset"),
        (col("n_found_multiset") === col("n_multiset_pairs"))
          .as("multiset_complete"),
        col("n_word_pairs"), col("n_sim_in_word"),
        round(col("n_sim_in_word").cast("double") /
          nullif(col("n_simhash_pairs"), lit(0L)), 6).as("precision_vs_word"))
  }

  /** Fingerprint sample for observability (rows-only check). */
  def fingerprintQuery(s: SparkSession, dir: String): DataFrame =
    withFingerprint(Tables.documents(s, dir), "text")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_simhash_neardup" -> (simhashQuery _),
    "q_simhash_fps"     -> (fingerprintQuery _),
    "q_simhash_rich"    -> (simhashRichQuery _),
    "q_simhash_quality" -> (qualityReport _))

  /** Shared oracle prelude: DuckDB recomputes the FNV-1a/simhash
    * fingerprints bit-exactly via HUGEINT mod-2^64 arithmetic —
    * `list_reduce` is the sequential FNV fold, `xor`/`<<`/`bit_count`
    * operate on HUGEINT natively. `unicode()` (codepoints) matches Java
    * `charAt` (UTF-16 units) on the BMP-only driver corpora. Distinct
    * tokens are hashed once, then joined back to occurrences (tiny vocab
    * ⇒ the token-hash table is small).
    */
  private def fpPrelude(where: String, distinctToks: Boolean = false): String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(${
         if (distinctToks) "list_distinct(string_split(text, ' '))"
         else "string_split(text, ' ')"}) AS tok
       |  FROM documents $where
       |), dtok AS (SELECT DISTINCT tok FROM toks
       |), thash AS MATERIALIZED (
       |  SELECT tok, list_reduce(
       |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |        [CAST(unicode(substring(tok, i, 1)) AS HUGEINT)
       |         FOR i IN generate_series(1, length(tok))]),
       |      (h, c) -> (xor(h, c) * 1099511628211) % 18446744073709551616) AS h
       |  FROM dtok
       |), bits AS (
       |  SELECT t.doc_id, b.bit,
       |    sum(CASE WHEN (th.h >> b.bit) % 2 = 1 THEN 1 ELSE -1 END) AS acc
       |  FROM toks t JOIN thash th USING (tok)
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
       |  GROUP BY 1, 2
       |), fps AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(CASE WHEN acc > 0
       |      THEN CAST(1 AS HUGEINT) << bit
       |      ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS fp
       |  FROM bits GROUP BY 1
       |)""".stripMargin

  /** The full SimHash family is DuckDB-oracle-checked: the exact Hamming
    * ≤ 3 pair set is quadratic in the oracle (fine at gate SF) while the
    * engine side stays chunk-bucketed — a hash match proves the banded
    * pipeline loses nothing vs brute force at gate scale. Occupancy-cap
    * drops would surface as a mismatch, not silence.
    */
  override def oracleSql: Map[String, String] = Map(
    "q_simhash_fps" ->
      s"""${fpPrelude("WHERE doc_id < 20")}
         |SELECT doc_id,
         |  CAST(CASE WHEN fp >= (CAST(1 AS HUGEINT) << 63)
         |    THEN fp - (CAST(1 AS HUGEINT) << 64) ELSE fp END AS BIGINT)
         |    AS simhash
         |FROM fps ORDER BY doc_id""".stripMargin,
    "q_simhash_neardup" ->
      s"""${fpPrelude("")}
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
         |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp, b.fp)) <= $hammingThreshold
         |ORDER BY a_id, b_id""".stripMargin,
    "q_simhash_rich" -> Tables.richOracle(
      s"""${fpPrelude("", distinctToks = true)}
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
         |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp, b.fp)) <= $hammingThreshold
         |ORDER BY a_id, b_id""".stripMargin),
    "q_simhash_quality" ->
      s"""${fpPrelude("")},
         |spairs AS MATERIALIZED (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM fps a JOIN fps b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.fp, b.fp)) <= $hammingThreshold
         |), mkeys AS MATERIALIZED (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS mkey
         |  FROM documents
         |), ws AS MATERIALIZED (
         |  SELECT doc_id, lang, source,
         |    list_distinct(string_split(text, ' ')) AS w
         |  FROM documents
         |), wpairs AS MATERIALIZED (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM ws a JOIN ws b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.w, b.w))::DOUBLE /
         |        (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
         |), agg AS (
         |  SELECT
         |    (SELECT count(*) FROM spairs) AS n_simhash_pairs,
         |    (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
         |       FROM (SELECT count(*) AS n FROM mkeys GROUP BY mkey))
         |      AS n_multiset_pairs,
         |    (SELECT count(*) FROM spairs s
         |       JOIN mkeys a ON s.a_id = a.doc_id
         |       JOIN mkeys b ON s.b_id = b.doc_id
         |      WHERE a.mkey = b.mkey) AS n_found_multiset,
         |    (SELECT count(*) FROM wpairs) AS n_word_pairs,
         |    (SELECT count(*) FROM spairs s
         |       JOIN wpairs w ON s.a_id = w.a_id AND s.b_id = w.b_id)
         |      AS n_sim_in_word
         |)
         |SELECT n_simhash_pairs, n_multiset_pairs, n_found_multiset,
         |  (n_found_multiset = n_multiset_pairs) AS multiset_complete,
         |  n_word_pairs, n_sim_in_word,
         |  round(n_sim_in_word::DOUBLE / nullif(n_simhash_pairs, 0), 6)
         |    AS precision_vs_word
         |FROM agg""".stripMargin)
}
