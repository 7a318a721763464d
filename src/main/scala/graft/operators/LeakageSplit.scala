package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` dedup-aware train/validation/test splitting — the leakage
  * guard an LLM data pipeline needs BEFORE it can trust any held-out
  * evaluation: splitting documents by a hash of their own id puts two
  * near-duplicates on opposite sides of the fence, and the model is then
  * "evaluated" on paraphrases of its training data. The standard fix
  * (e.g. the dedup-then-split discipline of the GPT-3/C4 contamination
  * analyses) is to split by the NEAR-DUP CLUSTER, not the document: every
  * member of a cluster inherits its representative's split, so the
  * train/eval boundary can never separate two documents the dedup pass
  * considers the same.
  *
  * Construction: verified near-dup pairs ([[MinHashDedup.minhashQuery]])
  * → connected components ([[DedupClusters.connectedComponents]]) →
  * every document joins its cluster representative (itself when
  * unclustered — singleton clusters need no row in the CC state), and
  * the split is the md5-bucket of `"split:" + rep` — the
  * `q_hash_sample` deterministic-membership pattern, so any md5-bearing
  * engine reproduces the assignment bit-exactly. 10/10/80
  * test/validation/train.
  *
  * Scale shape: CC state is pair-graph-sized (near-dup pairs only, far
  * smaller than the corpus); the corpus-sized work is ONE left join
  * against the (node, rep) labels on the corpus's own key — broadcast
  * when the pair graph is small, shuffle-on-doc_id otherwise — plus a
  * narrow md5 map. No corpus-sized window, no global sort before the
  * final 3-row rollup.
  *
  * The split-key prefix makes this assignment INDEPENDENT of the
  * `q_hash_sample` 30% sampling buckets: hashing the same id for both
  * decisions would correlate "sampled" with "test" (md5(id) drives
  * both), quietly skewing the held-out rate inside any downsampled run.
  */
object LeakageSplit extends QueryPack {

  /** Per-document split assignment: (doc_id, rep, bucket, split). */
  def splitAssignments(docs: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id"): DataFrame =
    splitFromComp(docs, DedupClusters.connectedComponents(pairs), idCol)

  /** Same, from an already-computed (node, cluster_rep) table — lets a
    * pipeline that already clustered (the training manifest) reuse it.
    */
  private[graft] def splitFromComp(docs: DataFrame, compIn: DataFrame,
                                   idCol: String = "doc_id"): DataFrame = {
    val comp = compIn.withColumnRenamed("node", idCol)
    docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("clustered",
        when(col("cluster_rep").isNotNull, 1L).otherwise(0L))
      .withColumn("rep", coalesce(col("cluster_rep"), col(idCol)))
      .withColumn("bucket",
        (conv(substring(md5(concat(lit("split:"), col("rep").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % 100))
      .withColumn("split",
        when(col("bucket") < 10, "test")
          .when(col("bucket") < 20, "validation")
          .otherwise("train"))
      .select(col(idCol), col("rep"), col("clustered"), col("bucket"),
        col("split"))
  }

  /** Driver query: the 3-row split report — documents, distinct cluster
    * groups, clustered (near-dup-involved) docs, and whitespace tokens
    * per side. The evidence a release checklist wants: the test fraction
    * actually realized, and how much near-dup mass each side carries.
    */
  def leakageSplitQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    splitFromComp(docs, DedupClusters.componentsStaged(s, dir))
      .join(docs.select(col("doc_id"), size(split(col("text"), " "))
        .cast("long").as("n_toks")), Seq("doc_id"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("rep")).as("n_groups"),
        sum(col("clustered")).as("n_clustered"),
        sum(col("n_toks")).as("n_tokens"))
      .select(col("split"), col("n_docs"), col("n_groups"),
        col("n_clustered"), col("n_tokens"))
      .orderBy(col("split"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_leakage_split" -> (leakageSplitQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_leakage_split" ->
      s"""${DedupClusters.closurePrelude}, assign AS (
         |  SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep,
         |    CASE WHEN c.node IS NULL THEN 0 ELSE 1 END AS clustered,
         |    len(string_split(d.text, ' ')) AS n_toks
         |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
         |), lab AS (
         |  SELECT doc_id, rep, clustered, n_toks,
         |    CAST(('0x' || substring(md5('split:' || rep::VARCHAR), 1, 8))
         |      AS BIGINT) % 100 AS bucket
         |  FROM assign
         |)
         |SELECT CASE WHEN bucket < 10 THEN 'test'
         |            WHEN bucket < 20 THEN 'validation'
         |            ELSE 'train' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT rep) AS BIGINT) AS n_groups,
         |  CAST(sum(clustered) AS BIGINT) AS n_clustered,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin)
}
