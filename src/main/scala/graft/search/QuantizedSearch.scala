package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.VectorFunctions.{cosineSimilarity, cosineSimilarityHof}

/** Int8 scalar-quantized similarity search — the memory-compression scale
  * path for 100 TB embedding serving (4× smaller than float32, 8× than
  * float64; the standard "SQ8" variant of Jégou et al.'s quantized-search
  * family). Asymmetric distance computation: the CORPUS side is quantized
  * to 256 levels on the global [min, max] element range and dequantized on
  * the fly; the QUERY stays full-precision (reference analogue: the
  * reference serves raw float32, similarity_search.py:294-313 — SQ8 is
  * what it would deploy when the corpus no longer fits memory).
  *
  * Scale shape: pass 1 is one min/max aggregate (1 row, broadcast back);
  * pass 2 is a per-row scalar expression chain (quantize → dequantize →
  * cosine) with no shuffle, topped by TakeOrderedAndProject. In a real
  * deployment the int8 codes are what's PERSISTED (the quantize map runs
  * once at ingest; serving reads codes + 2 doubles) — here the codes are
  * derived inline so the oracle can replicate the whole chain.
  *
  * Oracle determinism: quantization is exact double math (min/max are
  * order-insensitive aggregates; round-half-up at 0 dp matches DuckDB's
  * `round` for the non-negative arguments produced here), and the
  * dequantized cosine uses the HOF fold whose bit-parity with DuckDB's
  * `list_dot_product` is established by the q_knn_* gates
  * (CosineExprParitySpec proves HOF ≡ codegen Expr ≡ oracle formula).
  * `sim_exact` rides along so the result table itself documents the
  * fidelity loss of the compressed path.
  */
object QuantizedSearch extends QueryPack {

  /** 1-row global element range of the embedding matrix. */
  private[search] def elementRange(emb: DataFrame): DataFrame =
    emb.select(explode(col("embedding").cast("array<double>")).as("x"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Corpus rows with the dequantized-SQ8 embedding alongside the raw one.
    * code = round((x - mn) * 255.0 / (mx - mn)); dq = mn + code * (mx - mn)
    * / 255.0 — both spelled identically in the DuckDB oracle.
    */
  private[search] def withDequantized(emb: DataFrame, range: DataFrame): DataFrame =
    emb.crossJoin(broadcast(range))
      .withColumn("dq", transform(col("embedding").cast("array<double>"),
        x => col("mn") +
          round((x - col("mn")) * lit(255.0) / (col("mx") - col("mn"))) *
            (col("mx") - col("mn")) / lit(255.0)))

  /** Top-10 by quantized similarity, with the exact similarity alongside. */
  def sqTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb")))
    withDequantized(emb.filter(col("vec_id") =!= 0), elementRange(emb))
      .crossJoin(q)
      .select(col("vec_id"),
        round(cosineSimilarityHof(col("dq"), col("q_emb")), 6).as("sim_q"),
        round(cosineSimilarity(col("embedding"), col("q_emb")), 6).as("sim_exact"))
      .orderBy(col("sim_q").desc, col("vec_id"))
      .limit(10)
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_ann_sq" -> (sqTopK _))

  override def oracleSql: Map[String, String] = Map(
    "q_ann_sq" ->
      """WITH st AS (
        |  SELECT min(x) AS mn, max(x) AS mx
        |  FROM (SELECT unnest(embedding::DOUBLE[]) AS x FROM embeddings)),
        |dqc AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding::DOUBLE[],
        |      x -> mn + round((x - mn) * 255.0 / (mx - mn)) * (mx - mn) / 255.0) AS dq
        |  FROM embeddings, st
        |  WHERE vec_id <> 0),
        |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_dot_product(e.dq, q.q_emb::DOUBLE[]) /
        |    (sqrt(list_dot_product(e.dq, e.dq)) *
        |     sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[]))), 6) AS sim_q,
        |  round(list_dot_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[]))), 6) AS sim_exact
        |FROM dqc e, q
        |ORDER BY sim_q DESC, vec_id LIMIT 10""".stripMargin)
}
