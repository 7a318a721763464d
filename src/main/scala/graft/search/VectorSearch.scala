package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.VectorFunctions._

/** Top-k cosine similarity search — the reference's flagship query path
  * (similarity_search.py:294-313 per-shard top-k, 322-363 scatter-gather
  * merge, 366-407 statistics block).
  *
  * Spark design (SURVEY.md §3 E1): the query vector is a 1-row broadcast —
  * the "join" is a broadcast nested-loop producing one similarity per corpus
  * row (no shuffle); per-shard local top-k is a window `row_number() OVER
  * (PARTITION BY shard ORDER BY sim DESC)`; the global top-k is
  * `ORDER BY ... LIMIT k`, which Catalyst plans as TakeOrderedAndProject —
  * O(n log k) per partition + a k-sized merge on the driver, no full sort,
  * no shuffle. This shape scales linearly with corpus size and executor
  * count; at 100 TB the same plan holds (scan → map → per-partition heap).
  */
object VectorSearch extends QueryPack {

  /** Corpus with a shard ("hospital") key. The driver corpus has no shard
    * column, so shard = vec_id % 3, mirroring the reference's 3 hospitals
    * (similarity_search.py:592-596).
    */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).withColumn("hospital", expr("vec_id % 3"))

  /** 1-row broadcast query vector: the embedding of vec_id = 0. */
  private def queryVec(s: SparkSession, dir: String): DataFrame =
    broadcast(
      Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb")))

  /** Corpus scored against the broadcast query vector (query row excluded,
    * as the reference never scores the query against itself — it isn't
    * stored). Similarity rounded to 6 dp for cross-engine determinism.
    */
  private def scored(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir).filter(col("vec_id") =!= 0)
      .crossJoin(queryVec(s, dir))
      .select(
        col("vec_id"), col("label"), col("hospital"),
        round(cosineSimilarity(col("embedding"), col("q_emb")), 6).as("sim"))

  /** K2: brute-force global top-k (TakeOrderedAndProject). */
  def knnBrute(s: SparkSession, dir: String): DataFrame =
    scored(s, dir)
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("sim"))

  /** K1: per-shard local top-k via window row_number (SURVEY.md §2.5). */
  def knnPerShard(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("hospital")).orderBy(col("sim").desc, col("vec_id"))
    scored(s, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("hospital"), col("rank"), col("vec_id"), col("sim"))
      .orderBy(col("hospital"), col("rank"))
  }

  /** E1 scatter-gather: local top-k per shard, union, global re-sort, top-k
    * (similarity_search.py:322-363). The candidate pool for the global merge
    * is n_shards × k rows — tiny regardless of corpus size, which is exactly
    * why the reference's architecture scales: only local winners travel.
    */
  def scatterGather(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("hospital")).orderBy(col("sim").desc, col("vec_id"))
    scored(s, dir)
      .withColumn("local_rank", row_number().over(w))
      .filter(col("local_rank") <= 10)
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("rank"), col("vec_id"), col("hospital"), col("sim"))
  }

  /** A3-shaped statistics block over the top-k hit set: one conditional-agg
    * pass (count / conditional counts / rates / means — the reference's
    * transplant_statistics, similarity_search.py:366-407, re-expressed over
    * the driver corpus where `label` plays the outcome role).
    */
  def knnStats(s: SparkSession, dir: String): DataFrame = {
    val hits = scored(s, dir)
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(50)
    hits.agg(
      count(lit(1)).as("total_hits"),
      sum(when(col("label") % 2 === 0, 1L).otherwise(0L)).as("even_label_count"),
      sum(when(col("label") % 2 =!= 0, 1L).otherwise(0L)).as("odd_label_count"),
      round(avg(col("sim")), 6).as("avg_sim"),
      round(min(col("sim")), 6).as("min_sim"),
      round(max(col("sim")), 6).as("max_sim"),
      count_distinct(col("hospital")).as("hospitals_hit"))
  }

  /** Batched multi-query top-k: all query vectors broadcast at once, one
    * scan of the corpus, per-query bounded-heap partial aggregation
    * ([[graft.functions.TopKAggregator]]). The shuffle carries ≤ k
    * candidates per (partition × query) — corpus rows never shuffle, so
    * query THROUGHPUT scales with cluster width while per-query latency
    * stays one scan amortized over the whole batch. This is the shape
    * that beats the reference's one-query-at-a-time loop.
    */
  def batchKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(cosineSimilarity(col("embedding"), col("q_emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByExpr(col("vec_id"), col("sim"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"), col("col.score").as("sim"))
      .orderBy(col("query_id"), col("rank"))

  def batchKnnQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    batchKnn(emb, queries, 5)
  }

  /** A4: scalar variance over every element of the embedding matrix
    * (torch.var = sample variance, similarity_search.py:256-260).
    */
  def embVariance(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(explode(col("embedding").cast("array<double>")).as("x"))
      .agg(round(var_samp(col("x")), 6).as("emb_var"), count(lit(1)).as("n_elems"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_knn_brute"      -> (knnBrute _),
    "q_knn_per_shard"  -> (knnPerShard _),
    "q_scatter_gather" -> (scatterGather _),
    "q_knn_stats"      -> (knnStats _),
    "q_batch_knn"      -> (batchKnnQuery _),
    "q_emb_variance"   -> (embVariance _))

  private val cosSql =
    """list_dot_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) /
      | (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
      |  sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])))""".stripMargin

  private val scoredSql =
    s"""SELECT e.vec_id, e.label, e.vec_id % 3 AS hospital,
       | round($cosSql, 6) AS sim
       | FROM embeddings e,
       |  (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
       | WHERE e.vec_id <> 0""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_knn_brute" ->
      s"""SELECT vec_id, sim FROM ($scoredSql)
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_knn_per_shard" ->
      s"""SELECT hospital, rank, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY hospital ORDER BY sim DESC, vec_id) AS rank
         |  FROM ($scoredSql)) WHERE rank <= 5
         | ORDER BY hospital, rank""".stripMargin,
    "q_scatter_gather" ->
      s"""SELECT row_number() OVER (ORDER BY sim DESC, vec_id) AS rank, vec_id, hospital, sim
         | FROM (
         |  SELECT * FROM (
         |   SELECT *, row_number() OVER (PARTITION BY hospital ORDER BY sim DESC, vec_id) AS local_rank
         |   FROM ($scoredSql)) WHERE local_rank <= 10
         |  ORDER BY sim DESC, vec_id LIMIT 10)
         | ORDER BY rank""".stripMargin,
    "q_knn_stats" ->
      s"""SELECT count(*) AS total_hits,
         |  CAST(sum(CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS even_label_count,
         |  CAST(sum(CASE WHEN label % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS odd_label_count,
         |  round(avg(sim), 6) AS avg_sim,
         |  round(min(sim), 6) AS min_sim,
         |  round(max(sim), 6) AS max_sim,
         |  count(DISTINCT hospital) AS hospitals_hit
         | FROM (SELECT * FROM ($scoredSql) ORDER BY sim DESC, vec_id LIMIT 50)""".stripMargin,
    "q_emb_variance" ->
      """SELECT round(var_samp(x), 6) AS emb_var, count(*) AS n_elems
        | FROM (SELECT unnest(embedding::DOUBLE[]) AS x FROM embeddings)""".stripMargin,
    "q_batch_knn" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5)
        | SELECT query_id, CAST(rank AS INT) AS rank, vec_id, sim FROM (
        |  SELECT q.query_id, e.vec_id,
        |   round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6) AS sim,
        |   row_number() OVER (PARTITION BY q.query_id
        |     ORDER BY round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
        |      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6) DESC, e.vec_id) AS rank
        |  FROM embeddings e, q)
        | WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)
}
