package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` the END-TO-END training-data manifest — the capstone
  * composition that proves the round's operators assemble into the
  * pipeline they exist for:
  *
  *  1. CURATE: exact-dup, near-dup-cluster, and quality verdicts
  *     ([[CuratedCorpus.decisionsFromComp]]) — only `reason_bits = 0`
  *     documents go anywhere near training;
  *  2. SPLIT: kept docs assigned train/validation/test by their near-dup
  *     cluster representative ([[LeakageSplit.splitFromComp]]) — the
  *     leakage guard, sharing the SAME connected-components run as the
  *     curation verdicts (computed once; its per-round checkpoints make
  *     the label table cheap to consume from both legs);
  *  3. MIX: per-source fractional upsampling ([[EpochMix.epochMix]])
  *     applied to the TRAIN side only — evaluation sets are never
  *     upsampled (duplicated eval rows silently deflate variance and
  *     double-count errors);
  *  4. REPORT: the (split, source) manifest a training run signs off
  *     on — documents, rows after mixing, tokens after mixing.
  *
  * The oracle replays every stage in SQL: the minhash pair replication +
  * recursive-CTE closure + quality flags (the `q_curated_*` prelude),
  * the cluster-keyed md5 split, and the mix arithmetic — one query,
  * four operators, hash-exact.
  *
  * Scale shape = the union of its parts, nothing new added: one
  * fingerprint shuffle (exact leg), pair-graph-sized cluster state,
  * narrow quality/md5/mix maps, and low-cardinality rollups. The
  * compose introduces only doc_id-keyed joins of corpus-sized tables —
  * co-partitionable, no new quadratic term, no driver state.
  */
object TrainingManifest extends QueryPack {

  def manifest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val comp = DedupClusters.componentsStaged(s, dir)
    val dec = CuratedCorpus.decisionsFromComp(docs, comp)
    val kept = docs.join(
      dec.filter(col("is_kept") === 1L).select("doc_id"), "doc_id")
    val withMeta = kept
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .join(LeakageSplit.splitFromComp(kept, comp).select("doc_id", "split"),
        "doc_id")
    val train = EpochMix.epochMix(withMeta.filter(col("split") === "train"))
      .select("doc_id", "source", "split", "n_toks") // one row per copy
    val eval_ = withMeta.filter(col("split") =!= "train")
      .select("doc_id", "source", "split", "n_toks")
    train.unionByName(eval_)
      .groupBy(col("split"), col("source"))
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_rows"),
        sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("split"), col("source"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_training_manifest" -> (manifest _))

  override def oracleSql: Map[String, String] = Map(
    "q_training_manifest" ->
      s"""${CuratedCorpus.decisionsSqlShared}, kept AS (
         |  SELECT d.doc_id, d.source, len(string_split(d.text, ' ')) AS n_toks,
         |    COALESCE(c.rep, d.doc_id) AS rep
         |  FROM documents d
         |  JOIN dec ON dec.doc_id = d.doc_id AND dec.reason_bits = 0
         |  LEFT JOIN comp c ON c.node = d.doc_id
         |), lab AS (
         |  SELECT doc_id, source, n_toks,
         |    CASE WHEN CAST(('0x' || substring(md5('split:' || rep::VARCHAR),
         |           1, 8)) AS BIGINT) % 100 < 10 THEN 'test'
         |         WHEN CAST(('0x' || substring(md5('split:' || rep::VARCHAR),
         |           1, 8)) AS BIGINT) % 100 < 20 THEN 'validation'
         |         ELSE 'train' END AS split
         |  FROM kept
         |), mw AS (
         |  SELECT doc_id, source, split, n_toks,
         |    0.5 + CAST(substring(source, 4) AS INT) * 0.25 AS w,
         |    CAST(('0x' || substring(md5('mix:' || doc_id::VARCHAR), 1, 8))
         |      AS BIGINT) % 1000000 AS fh
         |  FROM lab
         |), mixed AS (
         |  SELECT doc_id, source, split, n_toks,
         |    CASE WHEN split = 'train' THEN
         |      CAST(floor(w) AS BIGINT) +
         |        CASE WHEN fh < CAST((w - floor(w)) * 1000000 AS BIGINT)
         |             THEN 1 ELSE 0 END
         |    ELSE 1 END AS n_copies
         |  FROM mw
         |)
         |SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_copies) AS BIGINT) AS n_rows,
         |  CAST(sum(n_copies * n_toks) AS BIGINT) AS n_tokens
         |FROM mixed WHERE n_copies > 0
         |GROUP BY split, source ORDER BY split, source""".stripMargin)
}
