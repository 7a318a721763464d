package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` exact set-similarity join via PREFIX FILTERING — the
  * AllPairs/PPJoin construction (Bayardo et al., WWW 2007; Xiao et al.,
  * WWW 2008): the published exact alternative to both the block-limited
  * quadratic ([[TextAnalysis.ngramJaccardPairs]] — misses cross-block
  * pairs) and probabilistic MinHash banding ([[MinHashDedup]] — misses
  * by chance). GLOBAL and EXACT at the same time.
  *
  * Principle: order every token set by one global total order (here
  * (corpus frequency, token) ascending — rarest first, the standard
  * candidate-minimizing heuristic; no rank table needed, the tuple IS
  * the order). For Jaccard ≥ t, a qualifying pair shares ≥ ⌈t·|A|⌉
  * tokens, so by pigeonhole its globally-smallest shared token lies
  * inside A's first |A| − ⌈t·|A|⌉ + 1 tokens — and likewise for B.
  * Joining only the PREFIX postings therefore finds every qualifying
  * pair; an exact intersection verify removes false candidates.
  *
  * Scale shape: one token-frequency aggregate (map-side combined), one
  * per-doc sort of its own tokens (narrow, no shuffle), one
  * postings-list self-join keyed on PREFIX tokens only — Σ_token f²
  * bounded by prefix length and rarest-first ordering (a stopword like
  * "the" almost never lands in a prefix, so the hot postings lists are
  * the RARE tokens), plus the size-ratio prune before the exact verify.
  * No O(corpus²) term anywhere; contrast the (lang, source) block join,
  * whose worst block is quadratic in the dominant block's size.
  */
object PrefixJoin extends QueryPack {

  private val Threshold = 0.8 // Jaccard = 4/5; prefix len via exact integer arithmetic

  /** (doc_id, ws) distinct word sets. */
  private[operators] def tokenSets(docsIn: DataFrame): DataFrame =
    docsIn.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))

  /** Candidate pairs (a_id, b_id) from the prefix-postings join + size-ratio
    * prune, BEFORE the exact verify — exposed so the selectivity spec can
    * assert |candidates| ≪ n(n−1)/2 on the rich corpus. `docs` is
    * [[tokenSets]] output.
    *
    * Prefix length n − ⌈t·n⌉ + 1 with t = 4/5 computed in INTEGER
    * arithmetic: ⌈4n/5⌉ = (4n + 4) div 5, so no floating-point product
    * whose rounding could shorten the prefix below the safe bound if the
    * threshold ever changes (at t=0.8 the double happened to round
    * exactly; the integer form is correct for any rational threshold).
    */
  private[operators] def candidatePairs(docs: DataFrame): DataFrame = {
    val freq = docs.select(col("doc_id"), explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val sorted = docs.select(col("doc_id"), explode(col("ws")).as("tok"))
      .join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("cnt"), col("tok")))).as("ord"),
        count(lit(1)).as("n"))
      .select(col("doc_id"), col("n"),
        expr("transform(slice(ord, 1, CAST(n - ((4 * n + 4) div 5) + 1 AS INT)), " +
          "x -> x.tok)").as("prefix"))
    val posts = sorted.select(col("doc_id"), col("n"),
      explode(col("prefix")).as("tok"))
    posts.select(col("tok"), col("doc_id").as("a_id"), col("n").as("a_n"))
      .join(posts.select(col("tok"), col("doc_id").as("b_id"), col("n").as("b_n")),
        Seq("tok"))
      .filter(col("a_id") < col("b_id"))
      // size-ratio prune (jac <= min/max, so below-ratio pairs can't qualify)
      .filter(col("a_n") * 5 >= col("b_n") * 4 && col("b_n") * 5 >= col("a_n") * 4)
      .select(col("a_id"), col("b_id"))
      // explicit-width repartition on the distinct keys REPLACES the
      // distinct's own exchange (the aggregate reuses the clustering) and
      // pins the candidate set — and with it the downstream exact-verify
      // joins, which broadcast the doc sides and inherit this width — at
      // cluster parallelism. Without it, AQE's byte-based coalescing folds
      // the candidate shuffle (KBs of id pairs) to ONE task and the whole
      // CPU-bound array_intersect verify runs on one core.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("a_id"), col("b_id"))
      .distinct()
  }

  /** All pairs in `docs` (doc_id, text) with word-set Jaccard ≥ 0.8 —
    * corpus-wide, no blocking.
    */
  private[operators] def prefixJaccardOn(docsIn: DataFrame): DataFrame = {
    val docs = tokenSets(docsIn)
    // exact verify on the candidate pairs only
    val aSets = docs.select(col("doc_id").as("a_id"), col("ws").as("a_ws"))
    val bSets = docs.select(col("doc_id").as("b_id"), col("ws").as("b_ws"))
    candidatePairs(docs).join(aSets, Seq("a_id")).join(bSets, Seq("b_id"))
      .withColumn("jac",
        round(size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
              size(array_union(col("a_ws"), col("b_ws"))).cast("double"), 6))
      .filter(col("jac") >= Threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Driver query: the join over a deterministic 1-in-10 md5 subsample
    * (the `q_interval_join` bounding pattern). The synthetic corpus is
    * DEGENERATE for similarity joins — 31 distinct tokens total, so ~60%
    * of all 12.5M sf0.1 pairs qualify at t=0.8 and the RESULT ITSELF is
    * quadratic (~3M rows, measured 83 s — no candidate scheme can beat
    * its own output size). The subsample keeps the driver artifact
    * bounded at any SF while the operator stays global and unblocked;
    * on a real corpus (vocabulary ≫ document size) the rarest-first
    * prefixes are what bound the candidate volume.
    */
  def prefixJaccardPairs(s: SparkSession, dir: String): DataFrame =
    prefixJaccardOn(Tables.documents(s, dir)
      .filter(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long") % 100 < 10))

  /** The same join over [[Tables.richDocuments]] with NO subsample — the
    * wide-vocabulary corpus makes the result linear in the planted
    * near-dup groups (549 of 124 750 pairs at sf0.01, measured), so the
    * driver artifact finally DEMONSTRATES prefix-filtering selectivity
    * (candidates ≪ n(n−1)/2 — asserted by PrefixJoinSpec) instead of
    * arguing it around a degenerate fixture.
    */
  def prefixJaccardRich(s: SparkSession, dir: String): DataFrame =
    prefixJaccardOn(Tables.richDocumentsStaged(s, dir))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_prefix_jaccard" -> (prefixJaccardPairs _),
    "q_prefix_jaccard_rich" -> (prefixJaccardRich _))

  /** Oracle: the UNBLOCKED exact quadratic — tractable for DuckDB at
    * sf0.01, which is exactly why the engine side must NOT use it.
    */
  override def oracleSql: Map[String, String] = Map(
    "q_prefix_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
        |  FROM documents
        |  WHERE CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
        |    % 100 < 10)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.ws, b.ws))::DOUBLE
        |    / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6)
        |    AS jac
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.ws, b.ws))::DOUBLE
        |    / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6)
        |  >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "q_prefix_jaccard_rich" -> (Tables.richCorpusSql +
      """,
        |d AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
        |  FROM rich)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.ws, b.ws))::DOUBLE
        |    / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6)
        |    AS jac
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.ws, b.ws))::DOUBLE
        |    / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6)
        |  >= 0.8
        |ORDER BY a_id, b_id""".stripMargin))
}
