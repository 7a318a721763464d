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

  /** MinHash signature UDF: text → k-long signature in one JVM pass. */
  private def signatureUdf(seed: Long) = {
    val cs = coeffs(seed)
    udf { (text: String) =>
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

  /** Candidate pairs from band-bucket join, verified with exact Jaccard on
    * word sets; returns pairs with jaccard ≥ threshold.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    // candidate generation carries ONLY (band, bucket, id) through the
    // shuffle — word-set payloads would multiply shuffle bytes by the
    // banding factor; they join back in only for the (small) verified set
    val banded = withSignature(docs, textCol, seed)
      .select(col(idCol).as("id"), col("minhash_sig"))
      .withColumn("band",
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_id"),
            xxhash64(b, concat_ws(",",
              slice(col("minhash_sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
              .as("bucket")))))
      .select(col("band.band_id"), col("band.bucket"), col("id"))
      // the self-join consumes this twice; without caching, the signature
      // UDF runs 2× over the corpus
      .cache()

    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band_id", "bucket"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .distinct() // a pair may collide in many bands

    val ws = docs.select(col(idCol).as("id"),
      array_distinct(split(col(textCol), " ")).as("ws"))

    candidates
      .join(ws.select(col("id").as("a_id"), col("ws").as("a_ws")), "a_id")
      .join(ws.select(col("id").as("b_id"), col("ws").as("b_ws")), "b_id")
      .withColumn("jac",
        round(size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
              size(array_union(col("a_ws"), col("b_ws"))).cast("double"), 6))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  def minhashQuery(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.8)

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_minhash_neardup" -> (minhashQuery _))

  /** MinHash banding isn't DuckDB-expressible (xxhash64 + custom affine
    * hashes); correctness is scalatest-checked against the exact blocked
    * Jaccard join (recall/precision), and the final pairs are a subset
    * relation the suite asserts.
    */
  override def oracleSql: Map[String, String] = Map.empty
}
