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
  private val gear: Array[Long] = {
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
    */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
                   minShared: Int = 2,
                   maxPostings: Int = MinHashDedup.defaultMaxBucketSize): DataFrame = {
    val spark = docs.sparkSession
    val dropped = spark.sparkContext.longAccumulator(droppedChunksAcc)
    val refs = chunkRefs(docs, idCol, textCol)
      // a doc repeating a chunk internally counts it once toward overlap
      .dropDuplicates("doc_id", "chunk_hash")

    val emitCo = udf { (ds: Seq[Seq[Long]]) =>
      if (ds.length > maxPostings) {
        dropped.add(1)
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

    refs
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
  }

  def chunkStatsQuery(s: SparkSession, dir: String): DataFrame =
    chunkStats(s, dir)

  def overlapQuery(s: SparkSession, dir: String): DataFrame =
    overlapPairs(Tables.documents(s, dir), "doc_id", "text")

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_cdc_stats"   -> (chunkStatsQuery _),
    "q_cdc_overlap" -> (overlapQuery _))

  /** Chunk boundaries come from the JVM gear/rolling-hash kernel (a
    * sequential stateful scan with min/max bounds — not expressible as
    * DuckDB SQL), so both queries are rows-only; the chunking invariants
    * (reassembly, size bounds, boundary re-sync after edits, shared
    * suffix ⇒ shared chunks) are spec-asserted in CdcChunkingSpec.
    */
  override def oracleSql: Map[String, String] = Map.empty
}
