package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** Property-style tests (hand-rolled sampling — the scalatest/scalacheck
  * bridge artifact isn't in the offline cache): cosine algebraic laws,
  * sklearn zero-vector convention, known values.
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  private def randVec(n: Int = 8): Seq[Float] =
    Seq.fill(n)((rng.nextFloat() * 20 - 10))

  /** Evaluate cosine for many pairs in ONE Spark job (row-per-pair). */
  private def cosBatch(pairs: Seq[(Seq[Float], Seq[Float])]): Seq[Double] =
    pairs.toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0)).toSeq

  test("cosine(a, a) ≈ 1 for non-zero vectors") {
    val vs = Seq.fill(50)(randVec())
    cosBatch(vs.map(v => (v, v))).foreach(c => assert(math.abs(c - 1.0) < 1e-6))
  }

  test("cosine is bounded in [-1,1] and symmetric") {
    val pairs = Seq.fill(50)((randVec(), randVec()))
    val fwd = cosBatch(pairs)
    val rev = cosBatch(pairs.map(_.swap))
    fwd.zip(rev).foreach { case (f, r) =>
      assert(f >= -1.0 - 1e-9 && f <= 1.0 + 1e-9)
      assert(math.abs(f - r) < 1e-12)
    }
  }

  test("cosine is invariant under positive scaling") {
    val vs = Seq.fill(50)(randVec())
    val scales = Seq.fill(50)(rng.nextFloat() * 49.9f + 0.1f)
    cosBatch(vs.zip(scales).map { case (v, s) => (v, v.map(_ * s)) })
      .foreach(c => assert(math.abs(c - 1.0) < 1e-5))
  }

  test("zero-vector guard matches sklearn convention (similarity 0, not NaN)") {
    val zero = Seq.fill(4)(0f)
    val out = cosBatch(Seq((zero, Seq(1f, 2f, 3f, 4f)), (zero, zero)))
    assert(out == Seq(0.0, 0.0))
  }

  test("known values: orthogonal, opposite") {
    val out = cosBatch(Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(-1f, -2f))))
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) + 1.0) < 1e-9)
  }

  test("cosineDistance = 1 - similarity (similarity_search.py:309)") {
    val d = Seq((Seq(1f, 2f, 3f), Seq(3f, 2f, 1f))).toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b")).as("s"),
        cosineDistance(col("a"), col("b")).as("d"))
      .head()
    assert(math.abs(d.getDouble(0) + d.getDouble(1) - 1.0) < 1e-12)
  }

  test("euclidean distance known value") {
    val d = Seq((Seq(0f, 0f), Seq(3f, 4f))).toDF("a", "b")
      .select(euclideanDistance(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 5.0) < 1e-12)
  }
}
