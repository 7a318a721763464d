package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Content-defined chunking (Gear rolling hash, the FastCDC family) +
  * chunk-level exact dedup — the operator that catches PARTIAL-overlap
  * documents that whole-doc dedup misses: two docs sharing a long run of
  * bytes share the chunks strictly inside that run, because chunk
  * boundaries depend only on local content (the rolling hash re-syncs
  * after any edit), never on absolute offsets.
  *
  * Kernel: h = (h << 1) + gear(byte); a boundary falls where
  * (h & mask) == 0, subject to [minSize, maxSize] bounds (Xia et al.,
  * FastCDC, ATC'16). Chunk identity = FNV-1a of the chunk's bytes.
  *
  * Scale design: chunking is a narrow flatMap emitting (doc_id, idx,
  * hash, len) — chunk BYTES are hashed and dropped in place, so nothing
  * payload-sized ever shuffles. Chunk dedup is then a hash-aggregate on
  * the 8-byte chunk hash, and cross-doc overlap detection reuses the
  * capped postings-co-occurrence shape of
  * [[MinHashDedup.exactShinglePairs]] — work is Σ_chunk f², never
  * corpus². At warehouse scale the (hash → bytes) pairs land in a
  * content-addressable store and the corpus becomes a chunk-reference
  * table; `dup_chunk_bytes` below is exactly the storage that store
  * saves.
  *
  * Parameters are tuned to the driver corpus (~130-char docs):
  * min 16 / avg 32 / max 128 bytes. A crawl corpus would use
  * 2 KiB / 8 KiB / 64 KiB — the kernel is size-agnostic.
  */
object CdcChunking extends QueryPack {

  val minSize = 16
  val avgBits = 5 // boundary probability 1/32 per byte
  val maxSize = 128
  private val mask = (1 << avgBits) - 1

  /** Seeded gear table: 256 random longs (deterministic across executors). */
  private[operators] val gear: Array[Long] = {
    val rng = new scala.util.Random(42L)
    Array.fill(256)(rng.nextLong())
  }

  /** Chunk end offsets (exclusive) for a byte array — every input maps to
    * ≥ 1 chunk and offsets always cover the input exactly.
    */
  def boundaries(bytes: Array[Byte],
                 min: Int = minSize, max: Int = maxSize): Array[Int] = {
    val out = Array.newBuilder[Int]
    var start = 0
    val n = bytes.length
    while (start < n) {
      var h = 0L
      var i = start
      var end = -1
      val hardEnd = math.min(start + max, n)
      while (i < hardEnd && end < 0) {
        h = (h << 1) + gear(bytes(i) & 0xFF)
        if (i - start + 1 >= min && (h & mask) == 0L) end = i + 1
        i += 1
      }
      if (end < 0) end = hardEnd
      out += end
      start = end
    }
    out.result()
  }

  /** FNV-1a over a byte slice — chunk identity. */
  private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xFF).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** One text → (chunk_idx, chunk_hash, chunk_len) triples. */
  def chunksOf(text: String): Seq[(Int, Long, Int)] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.isEmpty) return Seq.empty
    var start = 0
    boundaries(bytes).zipWithIndex.map { case (end, idx) =>
      val t = (idx, fnv(bytes, start, end), end - start)
      start = end
      t
    }.toSeq
  }

  private val chunksUdf = udf { (text: String) => chunksOf(text) }

  /** Corpus → one row per chunk reference: (doc_id, source, chunk_idx,
    * chunk_hash, chunk_len). Narrow; payloads are hashed and dropped
    * in place.
    */
  def chunkRefs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col("source"),
        explode(chunksUdf(col(textCol))).as("c"))
      .select(col("doc_id"), col("source"), col("c._1").as("chunk_idx"),
        col("c._2").as("chunk_hash"), col("c._3").cast("long").as("chunk_len"))

  /** Chunk-level dedup stats per source — the content-addressable-store
    * sizing report: `dup_chunk_bytes` is the storage chunk-dedup
    * reclaims that whole-doc dedup cannot see. Distinctness is computed
    * globally (a chunk shared across sources counts once, attributed to
    * its first (hash-min) reference) so the total adds up.
    */
  def chunkStats(s: SparkSession, dir: String): DataFrame = {
    val refs = chunkRefs(Tables.documents(s, dir), "doc_id", "text")
    // one canonical owner per distinct chunk: the (doc, idx)-smallest ref
    val perChunk = refs
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("refs"),
        first(col("chunk_len")).as("chunk_len"),
        min(struct(col("doc_id"), col("chunk_idx"), col("source"))).as("owner"))
    perChunk
      .groupBy(col("owner.source").as("source"))
      .agg(
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("refs")).as("n_chunk_refs"),
        sum(col("chunk_len") * col("refs")).as("total_bytes"),
        sum(col("chunk_len")).as("distinct_bytes"),
        sum(col("chunk_len") * (col("refs") - 1)).as("dup_chunk_bytes"))
      .orderBy(col("source"))
  }

  val droppedChunksAcc = "graft.cdc.droppedChunks"

  /** Doc pairs sharing ≥ `minShared` chunks — partial-overlap detection
    * via postings co-occurrence on chunk hashes (capped + counted, the
    * [[MinHashDedup.exactShinglePairs]] shape). Emits shared-chunk count
    * and shared bytes per pair.
    *
    * CAVEAT (the [[MinHashDedup.exactShinglePairs]] one): the
    * `q_cdc_overlap` oracle enumerates ALL co-occurring chunk pairs,
    * so the gate is trustworthy only while the drop counters stay 0 —
    * a chunk whose posting list exceeds `maxPostings` (hot boilerplate
    * on a larger corpus) is dropped by the engine but not by the
    * oracle. Use [[overlapPairsWithStats]] and check
    * `stats.any == false` before trusting completeness.
    */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
                   minShared: Int = 2,
                   maxPostings: Int = MinHashDedup.defaultMaxBucketSize): DataFrame =
    overlapPairsWithStats(docs, idCol, textCol, minShared, maxPostings)._1

  /** [[overlapPairs]] plus ITS OWN drop accumulators (`buckets` = dropped
    * posting lists, `slots` = doc slots inside them) — the
    * [[MinHashDedup.candidatePairsWithStats]] contract: no shared global
    * state, at-least-once semantics under task retry.
    */
  def overlapPairsWithStats(docs: DataFrame, idCol: String, textCol: String,
                            minShared: Int = 2,
                            maxPostings: Int = MinHashDedup.defaultMaxBucketSize): (DataFrame, DropStats) = {
    val spark = docs.sparkSession
    val dropped = spark.sparkContext.longAccumulator(droppedChunksAcc)
    val droppedSlots = spark.sparkContext.longAccumulator(droppedChunksAcc + ".slots")
    val refs = chunkRefs(docs, idCol, textCol)
      // a doc repeating a chunk internally counts it once toward overlap
      .dropDuplicates("doc_id", "chunk_hash")

    val emitCo = udf { (ds: Seq[Seq[Long]]) =>
      if (ds.length > maxPostings) {
        dropped.add(1)
        droppedSlots.add(ds.length)
        Array.empty[(Long, Long, Long)]
      } else {
        val sorted = ds.map(d => (d(0), d(1))).sortBy(_._1)
        val out = Array.newBuilder[(Long, Long, Long)]
        var i = 0
        while (i < sorted.length) {
          var j = i + 1
          while (j < sorted.length) {
            out += ((sorted(i)._1, sorted(j)._1, sorted(i)._2))
            j += 1
          }
          i += 1
        }
        out.result()
      }
    }

    val pairs = refs
      .select(col("chunk_hash"), array(col("doc_id"), col("chunk_len")).as("d"))
      .groupBy("chunk_hash").agg(collect_list("d").as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(emitCo(col("ds"))).as("p"))
      .select(col("p._1").as("a_id"), col("p._2").as("b_id"),
        col("p._3").as("chunk_len"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("shared_chunks"),
        sum(col("chunk_len")).as("shared_bytes"))
      .filter(col("shared_chunks") >= minShared)
      .orderBy(col("a_id"), col("b_id"))
    (pairs, DropStats(dropped, droppedSlots))
  }

  def chunkStatsQuery(s: SparkSession, dir: String): DataFrame =
    chunkStats(s, dir)

  def overlapQuery(s: SparkSession, dir: String): DataFrame =
    overlapPairs(Tables.documents(s, dir), "doc_id", "text")

  /** CDC overlap on the RICH corpus (metadata-joined — [[chunkRefs]]
    * carries `source` for ownership): the 31-token fixture's texts are
    * near-identical at the byte level, so chunk sharing is ~total;
    * the wide-vocabulary corpus shows genuine partial overlap — group
    * siblings share the content-defined chunks their unmutated runs
    * produce, cross-group docs share almost none (spread spec-asserted
    * in RichCorpusSpec).
    */
  def overlapRichQuery(s: SparkSession, dir: String): DataFrame =
    overlapPairs(Tables.richDocumentsMeta(s, dir), "doc_id", "text")

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_cdc_stats"   -> (chunkStatsQuery _),
    "q_cdc_rich"    -> (overlapRichQuery _),
    "q_cdc_overlap" -> (overlapQuery _))

  /** Both CDC queries are DuckDB-oracle-checked despite the sequential
    * chunking kernel, via two observations:
    *
    *  1. the boundary predicate `(h & 31) == 0` only sees the last 5
    *     bytes — `gear(b) << k` vanishes under the mask for k ≥ 5, and
    *     minSize (16) ≥ 5 guarantees the 5-byte window never crosses the
    *     chunk start — so "is position i a cut point" is computable
    *     per-position from a sliding window, independent of where the
    *     chunk started (spec-asserted equivalence in CdcChunkingSpec);
    *  2. segmentation then becomes a recursive CTE walking a precomputed
    *     next-cut-at-or-after array with the min/max bounds as pure
    *     arithmetic.
    *
    * The gear table literals are inlined from the exact seeded JVM table;
    * chunk identity re-derives FNV-1a over the chunk text (ASCII corpus ⇒
    * bytes = codepoints, as in the multimodal oracles).
    */
  override def oracleSql: Map[String, String] = {
    val gearLit = gear.map(g =>
      s"CAST(${java.lang.Long.toUnsignedString(g)} AS HUGEINT)")
      .mkString("[", ",", "]")
    val fnv =
      """list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |    [CAST(unicode(substring(chunk, ci, 1)) AS HUGEINT)
        |     FOR ci IN generate_series(1, length(chunk))]),
        |    (h, c) -> (xor(h, c) * 1099511628211) % 18446744073709551616)""".stripMargin
    val prelude =
      s"""WITH RECURSIVE codes AS MATERIALIZED (
         |  SELECT doc_id, source, text, length(text) AS n,
         |    [unicode(substring(text, i, 1)) FOR i IN generate_series(1, length(text))] AS cs
         |  FROM documents
         |), g AS MATERIALIZED (SELECT $gearLit AS t
         |), pos AS MATERIALIZED (
         |  SELECT doc_id, i,
         |    (( g.t[cs[i] + 1]
         |     + CASE WHEN i >= 2 THEN g.t[cs[i-1] + 1] * 2 ELSE 0 END
         |     + CASE WHEN i >= 3 THEN g.t[cs[i-2] + 1] * 4 ELSE 0 END
         |     + CASE WHEN i >= 4 THEN g.t[cs[i-3] + 1] * 8 ELSE 0 END
         |     + CASE WHEN i >= 5 THEN g.t[cs[i-4] + 1] * 16 ELSE 0 END) % 32 = 0) AS p
         |  FROM (SELECT doc_id, cs, unnest(generate_series(1, n)) AS i FROM codes), g
         |), nb AS MATERIALIZED (
         |  SELECT doc_id, list(CASE WHEN nxt IS NULL THEN 1000000000 ELSE nxt END ORDER BY i) AS nxts
         |  FROM (
         |    SELECT doc_id, i,
         |      min(CASE WHEN p THEN i END) OVER (PARTITION BY doc_id ORDER BY i
         |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
         |    FROM pos)
         |  GROUP BY doc_id
         |), meta AS MATERIALIZED (
         |  SELECT c.doc_id, c.source, c.text, c.n, nb.nxts FROM codes c JOIN nb USING (doc_id)
         |), ch AS (
         |  SELECT doc_id, 0 AS idx, 0 AS s,
         |    least(CASE WHEN $minSize <= n THEN nxts[$minSize] ELSE 1000000000 END, $maxSize, n) AS e,
         |    n, nxts
         |  FROM meta
         |  UNION ALL
         |  SELECT doc_id, idx + 1, e,
         |    least(CASE WHEN e + $minSize <= n THEN nxts[e + $minSize] ELSE 1000000000 END,
         |          e + $maxSize, n),
         |    n, nxts
         |  FROM ch WHERE e < n
         |), chunks AS MATERIALIZED (
         |  SELECT m.doc_id, m.source, ch.idx AS chunk_idx,
         |    substring(m.text, ch.s + 1, ch.e - ch.s) AS chunk,
         |    ch.e - ch.s AS chunk_len
         |  FROM ch JOIN meta m USING (doc_id)
         |), chash AS MATERIALIZED (
         |  SELECT chunk,
         |    CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
         |      ELSE hu END AS BIGINT) AS chunk_hash
         |  FROM (SELECT chunk, $fnv AS hu FROM (SELECT DISTINCT chunk FROM chunks))
         |), refs AS MATERIALIZED (
         |  SELECT c.doc_id, c.source, c.chunk_idx, h.chunk_hash, c.chunk_len
         |  FROM chunks c JOIN chash h USING (chunk)
         |)""".stripMargin
    Map(
      "q_cdc_stats" -> (prelude +
        """
          |, per AS (
          |  SELECT chunk_hash, count(*) AS refs, min(chunk_len) AS chunk_len,
          |    min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx,
          |                    source := source)) AS owner
          |  FROM refs GROUP BY chunk_hash
          |)
          |SELECT owner.source AS source,
          |  CAST(count(*) AS BIGINT) AS n_distinct_chunks,
          |  CAST(sum(refs) AS BIGINT) AS n_chunk_refs,
          |  CAST(sum(chunk_len * refs) AS BIGINT) AS total_bytes,
          |  CAST(sum(chunk_len) AS BIGINT) AS distinct_bytes,
          |  CAST(sum(chunk_len * (refs - 1)) AS BIGINT) AS dup_chunk_bytes
          |FROM per GROUP BY 1 ORDER BY source""".stripMargin),
      "q_cdc_overlap" -> (prelude + overlapTail),
      "q_cdc_rich" -> graft.Tables.richMetaOracle(prelude + overlapTail))
  }

  private val overlapTail: String =
    """
      |, dref AS (
      |  SELECT DISTINCT doc_id, chunk_hash, chunk_len FROM refs
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(count(*) AS BIGINT) AS shared_chunks,
      |  CAST(sum(a.chunk_len) AS BIGINT) AS shared_bytes
      |FROM dref a JOIN dref b ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY a_id, b_id""".stripMargin
}
