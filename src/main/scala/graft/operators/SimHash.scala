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

  /** Accumulators of the most recent [[nearDupPairs]] plan; meaningful
    * after the returned DataFrame materializes (also in the Spark UI).
    */
  @volatile var lastDropStats
      : Option[(org.apache.spark.util.LongAccumulator,
                org.apache.spark.util.LongAccumulator)] = None

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
                   maxBucketSize: Int = defaultMaxBucketSize): DataFrame = {
    val spark = docs.sparkSession
    val droppedBuckets = spark.sparkContext.longAccumulator(droppedBucketsAcc)
    val droppedSlots = spark.sparkContext.longAccumulator(droppedDocSlotsAcc)
    lastDropStats = Some((droppedBuckets, droppedSlots))

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

    chunked
      .groupBy("chunk_id", "chunk_val").agg(collect_list("doc").as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(emitVerified(col("ds"))).as("p"))
      .select(col("p._1").as("a_id"), col("p._2").as("b_id"),
        col("p._3").as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))
  }

  def simhashQuery(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(s, dir), "doc_id", "text")

  /** Fingerprint sample for observability (rows-only check). */
  def fingerprintQuery(s: SparkSession, dir: String): DataFrame =
    withFingerprint(Tables.documents(s, dir), "text")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_simhash_neardup" -> (simhashQuery _),
    "q_simhash_fps"     -> (fingerprintQuery _))

  /** FNV/simhash bit math isn't DuckDB-expressible; scalatest-verified
    * (identical docs ⇒ distance 0; perturbation ⇒ small distance;
    * unrelated ⇒ large).
    */
  override def oracleSql: Map[String, String] = Map.empty
}
