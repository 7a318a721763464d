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

  /** Word n-gram shingles hashed to longs, as columns (codegen'd). */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(transform(idx, i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** MinHash signature UDF: shingle hash set → k-long signature. */
  private def signatureUdf(seed: Long) = {
    val cs = coeffs(seed)
    udf { (hashes: Seq[Long]) =>
      if (hashes.isEmpty) Array.fill(numHashes)(Long.MaxValue)
      else {
        val sig = Array.fill(numHashes)(Long.MaxValue)
        hashes.foreach { h =>
          // map into [0, prime) once; affine per hash function
          val x = java.lang.Long.remainderUnsigned(h, prime)
          var i = 0
          while (i < numHashes) {
            val (a, b) = cs(i)
            // (a*x + b) mod p without overflow: use Math.multiplyHigh-free
            // path via BigInt-free mulmod (128-bit via unsigned ops)
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
    df.withColumn("minhash_sig", signatureUdf(seed)(shingleHashes(col(textCol))))

  /** Candidate pairs from band-bucket join, verified with exact Jaccard on
    * word sets; returns pairs with jaccard ≥ threshold.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    val sigs = withSignature(docs, textCol, seed)
      .select(col(idCol).as("id"),
        array_distinct(split(col(textCol), " ")).as("ws"),
        col("minhash_sig"))

    val banded = sigs.withColumn("band",
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_id"),
          xxhash64(b, concat_ws(",",
            slice(col("minhash_sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
            .as("bucket")))))
      .select(col("id"), col("ws"), col("band.band_id"), col("band.bucket"))

    val a = banded.select(col("band_id"), col("bucket"),
      col("id").as("a_id"), col("ws").as("a_ws"))
    val b = banded.select(col("band_id"), col("bucket"),
      col("id").as("b_id"), col("ws").as("b_ws"))

    a.join(b, Seq("band_id", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_ws"), col("b_ws"))
      .dropDuplicates("a_id", "b_id") // candidate may collide in many bands
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
