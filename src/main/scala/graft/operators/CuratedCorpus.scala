package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` curated-corpus materialization — the "apply the decision" step
  * that closes the curation pipeline: the upstream operators DETECT exact
  * duplicates ([[TextAnalysis.dedupExact]]), form near-dup clusters with
  * keep-representatives ([[DedupClusters]]) and flag quality failures
  * ([[CorpusCuration.qualityFlags]]); this pack COMPOSES those decisions
  * into the kept corpus a training run would actually read, plus the
  * counts-reconciliation a production curation job logs.
  *
  * Per doc: a reason bitmap (1 = exact-dup non-canonical, 2 = near-dup
  * cluster non-representative, 4 = quality-rule failure; 0 = kept). The
  * bits are INDEPENDENT verdicts on the full corpus — a doc can carry
  * several — so the bitmap is an audit log, not just a filter: a 100 TB
  * run slices it to answer "how much did each rule cost us" without
  * re-running anything.
  *
  * Scale design: the exact-dup leg shuffles 16-byte md5 fingerprints
  * (never bodies); the cluster leg's output is one row per PAIR-GRAPH
  * vertex — vastly smaller than the corpus — so its join back is a
  * broadcast under AQE; the quality leg is narrow per-row expressions
  * fused into the corpus scan. One corpus-keyed shuffle total (the
  * fingerprint group), everything else map-side or broadcast.
  */
object CuratedCorpus extends QueryPack {

  /** Per-doc curation decisions given the corpus and a near-dup PAIR set
    * (factored out so specs can drive it with synthetic pairs). Returns
    * one row per doc: (doc_id, reason_bits, is_kept).
    */
  private[graft] def decisionsFor(docs: DataFrame, pairs: DataFrame): DataFrame =
    decisionsFromComp(docs, DedupClusters.connectedComponents(pairs))

  /** Same, from an already-computed (node, cluster_rep) table — so a
    * pipeline that also needs the clusters elsewhere (the training
    * manifest splits by them) runs connected components ONCE.
    */
  private[graft] def decisionsFromComp(docs: DataFrame, comp: DataFrame): DataFrame = {
    // exact-dup: canonical id = min doc_id per content fingerprint
    val fps = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val exact = fps
      .join(fps.groupBy("fp").agg(min(col("doc_id")).as("canonical_id")), "fp")
      .select(col("doc_id"), (col("doc_id") =!= col("canonical_id")).as("drop_exact"))
    // near-dup: cluster non-representatives (docs in no pair are absent —
    // their own singletons — hence the left join + coalesce below)
    val neardup = comp
      .select(col("node").as("doc_id"),
        (col("node") =!= col("cluster_rep")).as("drop_neardup"))
    val quality = CorpusCuration.qualityFlags(docs)
      .select(col("doc_id"), (!col("keep")).as("drop_quality"))
    docs.select("doc_id")
      .join(exact, Seq("doc_id"))
      .join(neardup, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"))
      .select(col("doc_id"),
        (when(col("drop_exact"), 1L).otherwise(0L) +
         when(coalesce(col("drop_neardup"), lit(false)), 2L).otherwise(0L) +
         when(col("drop_quality"), 4L).otherwise(0L)).as("reason_bits"))
      .withColumn("is_kept", when(col("reason_bits") === 0L, 1L).otherwise(0L))
  }

  private def decisions(s: SparkSession, dir: String): DataFrame =
    decisionsFromComp(Tables.documents(s, dir),
      DedupClusters.componentsStaged(s, dir))

  /** The materialized curated corpus: every doc with its reason bitmap;
    * `reason_bits = 0` rows ARE the kept corpus (filter on `is_kept` to
    * read it; the dropped rows are the audit trail).
    */
  def curatedQuery(s: SparkSession, dir: String): DataFrame =
    decisions(s, dir).orderBy(col("doc_id"))

  /** One-row counts reconciliation: total = kept + dropped by
    * construction; the per-reason counts OVERLAP (a doc may carry
    * several bits), which is why dropped ≠ their sum — the row a
    * curation job logs to prove the pipeline accounted for every doc.
    */
  def countsQuery(s: SparkSession, dir: String): DataFrame =
    decisions(s, dir).agg(
      count(lit(1)).as("n_total"),
      sum(col("reason_bits").bitwiseAND(1L)).as("n_drop_exact"),
      sum(shiftright(col("reason_bits").bitwiseAND(2L), 1)).as("n_drop_neardup"),
      sum(shiftright(col("reason_bits").bitwiseAND(4L), 2)).as("n_drop_quality"),
      sum(when(col("reason_bits") =!= 0L, 1L).otherwise(0L)).as("n_dropped"),
      sum(col("is_kept")).as("n_kept"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_curated_corpus" -> (curatedQuery _),
    "q_curated_counts" -> (countsQuery _))

  /** Oracle: nests the cluster closure prelude
    * ([[DedupClusters.closurePrelude]] — itself nesting the full minhash
    * pair replication) plus the shared per-doc quality flags
    * ([[CorpusCuration.qualityRowsSql]]) and an exact-dup window, then
    * assembles the identical bitmap per doc.
    */
  private[operators] def decisionsSqlShared: String = decisionsSql

  private def decisionsSql: String =
    s"""${DedupClusters.closurePrelude}, ex AS MATERIALIZED (
       |  SELECT doc_id,
       |    min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
       |  FROM documents
       |), qf AS MATERIALIZED (
       |${CorpusCuration.qualityRowsSql}
       |), dec AS MATERIALIZED (
       |  SELECT d.doc_id,
       |    CAST(CASE WHEN d.doc_id <> ex.canonical_id THEN 1 ELSE 0 END
       |       + CASE WHEN c.node IS NOT NULL AND d.doc_id <> c.rep THEN 2 ELSE 0 END
       |       + CASE WHEN NOT (qf.ok_len AND qf.ok_mwl AND qf.ok_stop
       |                        AND qf.ok_rep AND qf.ok_sym) THEN 4 ELSE 0 END
       |      AS BIGINT) AS reason_bits
       |  FROM documents d
       |  JOIN ex ON ex.doc_id = d.doc_id
       |  LEFT JOIN comp c ON c.node = d.doc_id
       |  JOIN qf ON qf.doc_id = d.doc_id
       |)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_curated_corpus" ->
      s"""$decisionsSql
         |SELECT doc_id, reason_bits,
         |  CAST(CASE WHEN reason_bits = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
         |FROM dec ORDER BY doc_id""".stripMargin,
    "q_curated_counts" ->
      s"""$decisionsSql
         |SELECT count(*) AS n_total,
         |  CAST(sum(reason_bits & 1) AS BIGINT) AS n_drop_exact,
         |  CAST(sum((reason_bits & 2) // 2) AS BIGINT) AS n_drop_neardup,
         |  CAST(sum((reason_bits & 4) // 4) AS BIGINT) AS n_drop_quality,
         |  CAST(sum(CASE WHEN reason_bits <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dropped,
         |  CAST(sum(CASE WHEN reason_bits = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept
         |FROM dec""".stripMargin)
}
