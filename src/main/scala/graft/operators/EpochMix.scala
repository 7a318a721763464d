package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` per-source epoch mixing with FRACTIONAL upsampling — the
  * data-mixing step of LLM pretraining recipes: each source carries a
  * weight like 2.3 meaning "every document appears twice, and a
  * deterministic 30% of documents a third time" (downweighting is the
  * same mechanism below 1.0: weight 0.5 keeps a deterministic half).
  * Materializing the repeats as (doc_id, copy_idx) rows lets every copy
  * be shuffled/sharded independently downstream instead of relying on a
  * training-loop sampler.
  *
  * Determinism: the fractional coin is the md5-bucket of
  * `"mix:" + doc_id` (the `q_hash_sample` membership pattern) — NOT a
  * seeded `rand()`, whose draw order is partitioning-dependent. Any
  * md5-bearing engine reproduces the exact copy multiset; re-running the
  * pipeline after a cluster resize emits byte-identical training data.
  *
  * Weight arithmetic stays in dyadic fractions (k * 0.25): exactly
  * representable in binary floating point, so `w - floor(w)` and its
  * scaled integer threshold are bit-identical across engines — the
  * fractional compare never sits on a rounding boundary.
  *
  * Scale shape: one narrow map over the corpus (md5 + arithmetic), one
  * `explode(sequence(...))` whose fan-out is the mix weight itself
  * (output-sized, the floor for ANY materializer); no shuffle until the
  * caller's own downstream repartition. The per-source report groups by
  * the low-cardinality source key only.
  */
object EpochMix extends QueryPack {

  private val Scale = 1000000L

  /** Default weight: source `srcK` gets 0.5 + K/4 — spans genuine
    * downsampling (src0 → 0.5, src1 → 0.75), identity-ish (src2 → 1.0),
    * and multi-epoch upsampling (src19 → 5.25) in one corpus.
    */
  def defaultWeight: Column =
    lit(0.5) + substring(col("source"), 4, 8).cast("int").cast("double") * lit(0.25)

  /** Materialized mix: one row per emitted copy —
    * (doc_id, source, w, n_copies, copy_idx). Documents whose copy count
    * resolves to 0 are dropped (that IS the downsample).
    */
  def epochMix(docs: DataFrame, weight: Column = defaultWeight,
               idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("w", weight)
      .withColumn("__fh",
        (conv(substring(md5(concat(lit("mix:"), col(idCol).cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % Scale))
      .withColumn("n_copies",
        floor(col("w")).cast("long") +
          when(col("__fh") <
            ((col("w") - floor(col("w"))) * Scale).cast("long"), 1L)
            .otherwise(0L))
      .withColumn("copy_idx", explode(
        when(col("n_copies") > 0, sequence(lit(1L), col("n_copies")))
          .otherwise(array())))
      .drop("__fh")

  /** Driver query: the per-source mixing report — weight, documents that
    * survived the fractional coin, rows emitted, realized multiplier.
    * Computed FROM the exploded rows (so the oracle checks the actual
    * fan-out, not just the arithmetic that predicts it).
    */
  def epochMixQuery(s: SparkSession, dir: String): DataFrame =
    epochMix(Tables.documents(s, dir))
      .groupBy(col("source"))
      .agg(
        round(first(col("w")), 6).as("weight"),
        count_distinct(col("doc_id")).as("n_docs_emitted"),
        count(lit(1)).as("n_rows_out"))
      .withColumn("realized",
        round(col("n_rows_out").cast("double") /
          col("n_docs_emitted").cast("double"), 6))
      .orderBy(col("source"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_epoch_mix" -> (epochMixQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_epoch_mix" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    0.5 + CAST(substring(source, 4) AS INT) * 0.25 AS w,
         |    CAST(('0x' || substring(md5('mix:' || doc_id::VARCHAR), 1, 8))
         |      AS BIGINT) % $Scale AS fh
         |  FROM documents
         |), c AS (
         |  SELECT source, w,
         |    CAST(floor(w) AS BIGINT) +
         |      CASE WHEN fh < CAST((w - floor(w)) * $Scale AS BIGINT)
         |           THEN 1 ELSE 0 END AS n_copies
         |  FROM d
         |)
         |SELECT source, round(any_value(w), 6) AS weight,
         |  CAST(count(*) AS BIGINT) AS n_docs_emitted,
         |  CAST(sum(n_copies) AS BIGINT) AS n_rows_out,
         |  round(CAST(sum(n_copies) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |    AS realized
         |FROM c WHERE n_copies > 0
         |GROUP BY source ORDER BY source""".stripMargin)
}
