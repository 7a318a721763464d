package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.VectorFunctions.cosineSimilarity

/** Hybrid lexical + vector retrieval — the natural extension of the
  * reference's similarity-search surface (similarity_search.py:322-363
  * serves pure vector top-k; production retrieval fuses it with a lexical
  * ranker). Two public constructions:
  *
  *  - BM25 (Robertson/Spärck Jones; the Okapi formulation with
  *    k1 = 1.2, b = 0.75) over the whitespace tokenizer the rest of the
  *    text stack uses, and
  *  - reciprocal rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009):
  *    rrf(d) = Σ_lists 1/(60 + rank_list(d)) over the lexical and vector
  *    top-k lists.
  *
  * Scale shape: BM25 is two passes over a NARROW projection of the corpus
  * — pass 1 computes one 1-row global-stats aggregate (N, avgdl, per-term
  * document frequencies) that broadcasts back onto pass 2's per-document
  * scorer, so document bodies are scanned (column-pruned) but never
  * shuffled; the only exchange is the 1-row aggregate. Top-k is
  * TakeOrderedAndProject. The fusion joins two ≤ k-row ranked lists —
  * driver-scale regardless of corpus size.
  *
  * Determinism for the oracle gate: every per-document quantity (tf, dl,
  * df, N) is an integer-valued double, so partial-aggregation order cannot
  * perturb sums; the score is one fixed-shape double expression evaluated
  * identically by Spark and DuckDB (numeric literals are spelled, not
  * derived, so both engines parse the same doubles), rounded to 6 dp with
  * doc_id tiebreaks before any rank is taken.
  */
object HybridSearch extends QueryPack {

  /** Fixed demo query terms (present in the synthetic vocabulary). */
  private[search] val Terms: Seq[String] = Seq("merge", "sort", "stream")

  /** Rich-corpus query terms: Zipf ranks 5 / 20 / 80 — high, mid, and
    * low document frequency, the idf spread BM25 exists to exploit and
    * the near-uniform 31-token corpus cannot produce.
    */
  private[search] val RichTerms: Seq[String] = Seq("w5", "w20", "w80")

  /** Per-document term statistics over the whitespace tokenizer:
    * doc_id, dl (token count), tf_i per query term. One narrow scan.
    */
  private[search] def docTermStats(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(
      col("doc_id") +:
        size(toks).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("double").as(s"tf$i")
        }: _*)
  }

  /** BM25 scores for [[Terms]] over a (doc_id, text) corpus: docs matching
    * at least one term, scored. k1/b and their derived constants are
    * spelled as the literals 1.2 / 2.2 / 0.25 / 0.75 in BOTH engines —
    * deriving 2.2 as k1+1 in Scala yields a different double than the
    * parsed literal 2.2, which would break oracle bit-parity.
    */
  private[search] def bm25Scored(docs: DataFrame,
                                 terms: Seq[String] = Terms): DataFrame = {
    val d = docTermStats(docs, terms)
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i")
      }
    val stats = d.agg(statCols.head, statCols.tail: _*)
    def termWeight(i: Int): Column = {
      val tf  = col(s"tf$i")
      val idf = log((col("n_docs") - col(s"df$i") + lit(0.5)) /
        (col(s"df$i") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
    }
    d.filter(terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(terms.indices.map(termWeight).reduce(_ + _), 6).as("bm25"))
  }

  /** Lexical top-20: BM25 over the documents table. */
  def bm25TopDocs(s: SparkSession, dir: String): DataFrame =
    bm25Scored(Tables.documents(s, dir))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  /** BM25 over [[Tables.richDocuments]] with the idf-spread
    * [[RichTerms]] — same plan, evidential score distribution.
    */
  def bm25TopDocsRich(s: SparkSession, dir: String): DataFrame =
    bm25Scored(Tables.richDocumentsStaged(s, dir), RichTerms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  /** Hybrid fusion: RRF over the lexical (BM25) top-100 and the vector
    * (cosine vs the vec_id = 0 embedding) top-100. doc_id and vec_id are
    * aligned in this corpus, so the two lists key on the same id space. A
    * document missing from one list contributes 0 for that list (the
    * standard RRF convention) — hence the full-outer join. Both rank lists
    * are limit-k'd (TakeOrderedAndProject) BEFORE the rank window, so the
    * window sorts ≤ 100 rows.
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = bm25Scored(Tables.documents(s, dir))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(100)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("lex_id"), col("lex_rank"))

    val emb = Tables.embeddings(s, dir)
    val q = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb")))
    val vec = emb.crossJoin(q)
      .select(col("vec_id"),
        round(cosineSimilarity(col("embedding"), col("q_emb")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(100)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id"), col("vec_rank"))

    lex.join(vec, col("lex_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("lex_id"), col("vec_id")).as("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0)),
          6).as("rrf_score"),
        col("lex_rank"), col("vec_rank"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(20)
  }

  /** Proximity search: documents where 'merge' and 'sort' co-occur within
    * 3 tokens. Token positions and the pairwise gap matrix are computed
    * IN-ROW with nested higher-order functions (positions → |p−q| for
    * every cross pair → array_min), so the operator is a pure per-row
    * scalar chain — no explode, no shuffle, cost bounded by the per-doc
    * term counts. This is the positional-index capability a lexical
    * engine pairs with [[bm25TopDocs]]; at 100 TB the same plan is one
    * column-pruned scan.
    */
  def proximitySearch(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    // one pass over the token array via the index-aware transform lambda
    // (a sequence+element_at formulation is O(n) boxed random accesses
    // per row — 15× slower measured at sf0.1)
    def positions(term: String): Column =
      filter(
        transform(col("toks"), (x, i) => when(x === lit(term), i).otherwise(lit(-1))),
        p => p >= 0)
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("p1", positions("merge"))
      .withColumn("p2", positions("sort"))
      .filter(size(col("p1")) > 0 && size(col("p2")) > 0)
      .withColumn("min_gap", array_min(flatten(
        transform(col("p1"), p => transform(col("p2"), q => abs(p - q)))))
        .cast("long"))
      .filter(col("min_gap") <= 3)
      .select(col("doc_id"), col("min_gap"),
        size(col("p1")).cast("long").as("n_merge"),
        size(col("p2")).cast("long").as("n_sort"))
      .orderBy(col("doc_id"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_bm25"        -> (bm25TopDocs _),
    "q_bm25_rich"   -> (bm25TopDocsRich _),
    "q_hybrid_rrf"  -> (hybridRrf _),
    "q_prox_search" -> (proximitySearch _))

  private val bm25Cte = bm25CteFor(Terms)

  /** Shared CTE text: per-doc term stats + the 1-row stats, DuckDB side. */
  private def bm25CteFor(terms: Seq[String]): String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' '))::DOUBLE AS dl,
      |    len(list_filter(string_split(text, ' '), x -> x = '${terms(0)}'))::DOUBLE AS tf0,
      |    len(list_filter(string_split(text, ' '), x -> x = '${terms(1)}'))::DOUBLE AS tf1,
      |    len(list_filter(string_split(text, ' '), x -> x = '${terms(2)}'))::DOUBLE AS tf2
      |  FROM documents),
      |st AS (
      |  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
      |    sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
      |    sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
      |    sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
      |  FROM d),
      |scored AS (
      |  SELECT doc_id, round(
      |    ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2) /
      |      (tf0 + 1.2 * (0.25 + 0.75 * (dl / avgdl))) +
      |    ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2) /
      |      (tf1 + 1.2 * (0.25 + 0.75 * (dl / avgdl))) +
      |    ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2) /
      |      (tf2 + 1.2 * (0.25 + 0.75 * (dl / avgdl))), 6) AS bm25
      |  FROM d, st
      |  WHERE tf0 + tf1 + tf2 > 0)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_prox_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    list_filter(range(len(toks)), i -> toks[i + 1] = 'merge') AS p1,
        |    list_filter(range(len(toks)), i -> toks[i + 1] = 'sort') AS p2
        |  FROM t),
        |g AS (
        |  SELECT doc_id, p1, p2,
        |    CAST(list_min(flatten(list_transform(p1,
        |      x -> list_transform(p2, y -> abs(x - y))))) AS BIGINT) AS min_gap
        |  FROM p WHERE len(p1) > 0 AND len(p2) > 0)
        |SELECT doc_id, min_gap,
        |  CAST(len(p1) AS BIGINT) AS n_merge,
        |  CAST(len(p2) AS BIGINT) AS n_sort
        |FROM g WHERE min_gap <= 3
        |ORDER BY doc_id""".stripMargin,
    "q_bm25" ->
      s"""$bm25Cte
         |SELECT doc_id, bm25 FROM scored
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_bm25_rich" -> Tables.richOracle(
      s"""${bm25CteFor(RichTerms)}
         |SELECT doc_id, bm25 FROM scored
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin),
    "q_hybrid_rrf" ->
      s"""$bm25Cte,
         |lex AS (
         |  SELECT doc_id AS lex_id, rank AS lex_rank FROM (
         |    SELECT doc_id, bm25,
         |      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |    FROM scored) WHERE rank <= 100),
         |vec AS (
         |  SELECT vec_id, rank AS vec_rank FROM (
         |    SELECT vec_id,
         |      row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
         |    FROM (
         |      SELECT e.vec_id,
         |        round(list_dot_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) /
         |          (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
         |           sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[]))), 6) AS sim
         |      FROM embeddings e,
         |        (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q))
         |  WHERE rank <= 100)
         |SELECT coalesce(lex_id, vec_id) AS doc_id,
         |  round(coalesce(1.0 / (60.0 + lex_rank), 0.0) +
         |        coalesce(1.0 / (60.0 + vec_rank), 0.0), 6) AS rrf_score,
         |  lex_rank, vec_rank
         |FROM lex FULL OUTER JOIN vec ON lex_id = vec_id
         |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin)
}
