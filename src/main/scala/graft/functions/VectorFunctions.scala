package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions over `ArrayType(FloatType)` embedding columns.
  *
  * Capability parity with the reference's sklearn `cosine_similarity`
  * (reference similarity_search.py:300-302); expressed as Spark SQL
  * higher-order functions so the whole computation stays inside Catalyst
  * (no Scala UDF serialization, deterministic sequential double
  * accumulation — which also makes results bit-comparable with a DuckDB
  * `list_dot_product` oracle over `DOUBLE[]` casts).
  *
  * Scale note: these are per-row scalar expressions — they parallelize
  * embarrassingly and need no shuffle. For the 100 TB hot path a
  * codegen'd Catalyst Expression variant exists in
  * [[graft.functions.CosineSimilarityExpr]].
  */
object VectorFunctions {

  /** Elementwise product then sequential left-fold sum, all in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity with the sklearn zero-vector convention (zero-norm
    * vector ⇒ similarity 0, never NaN — matching
    * `sklearn.metrics.pairwise.cosine_similarity`, reference
    * similarity_search.py:300-302).
    *
    * Dispatches to the codegen'd [[CosineSimilarityExpr]] (bit-identical
    * to the HOF formulation below, see CosineExprParitySpec).
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    CosineSimilarityExpr(a, b)

  /** Reference formulation via SQL higher-order functions — kept as the
    * parity oracle for the codegen expression and for use on
    * `array<double>` inputs.
    */
  def cosineSimilarityHof(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** 1 - cosine, the "distance" the reference reports (similarity_search.py:309). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Euclidean distance in double precision. */
  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x))
}
