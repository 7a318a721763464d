package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` C4-style cross-document SPAN deduplication: the corpus is cut
  * into fixed-length word spans, any span text occurring more than once
  * ANYWHERE in the corpus keeps only its first occurrence (ordered by
  * (doc_id, span index)), and documents are reassembled from their
  * surviving spans. This is the sub-document complement of the
  * whole/near-document dedup tier ([[MinHashDedup]], [[SimHash]]):
  * boilerplate repeated across otherwise-distinct pages — headers,
  * licence blocks, templated paragraphs — is exactly what C4's
  * three-sentence-span rule removes from web corpora (the reference
  * pipeline's corpus construction, applied at span granularity).
  *
  * Span semantics: consecutive NON-OVERLAPPING windows of `spanWords`
  * whitespace-delimited words; the trailing remainder shorter than a
  * span is always kept (too short to be meaningful boilerplate — the
  * same reason C4 exempts short lines).
  *
  * Scale shape: one narrow tokenize/chunk pass (all higher-order
  * functions inside whole-stage codegen — no UDFs), ONE shuffle by span
  * text for the first-occurrence rank, one shuffle back by doc for
  * reassembly. Map-side partial aggregation does not apply to the rank
  * window, but the span-text key space is near-uniform (spans are long
  * enough that hot keys are exactly the boilerplate being removed, each
  * group ≪ corpus); a pathological single-span skew would be salted by
  * pre-aggregating (span → min position) before the join, which is the
  * groupBy+join twin of this window plan.
  */
object SpanDedup extends QueryPack {

  /** Per-document result: original span count, surviving span count, and
    * the md5 of the reassembled text (order-preserving).
    */
  def dedupSpans(docs: DataFrame, spanWords: Int = 10): DataFrame = {
    val w = split(col("text"), " ")
    val nSpans = (size(w) / spanWords).cast("int")
    // sequence(0, -1) would DESCEND — guard the zero-span case
    val spanIdx = when(nSpans > 0, sequence(lit(0), nSpans - 1))
      .otherwise(array().cast("array<int>"))
    val spans = transform(spanIdx, i =>
      concat_ws(" ", slice(w, i * spanWords + 1, lit(spanWords))))
    val tail = when(size(w) % spanWords === 0, lit(null))
      .otherwise(concat_ws(" ",
        slice(w, nSpans * spanWords + 1, size(w) - nSpans * spanWords)))

    val base = docs.select(col("doc_id"), spans.as("spans"),
      nSpans.as("n_spans"), tail.as("tail"))

    val exploded = base
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("ci", "span")))
    val firstOnly = exploded
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("span"))
          .orderBy(col("doc_id"), col("ci"))))
      .filter(col("rk") === 1)
    val rebuiltSpans = firstOnly
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("ci"), col("span")))),
          s => s.getField("span"))).as("body"))

    base.join(rebuiltSpans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        col("n_spans").cast("long").as("n_spans"),
        coalesce(col("n_kept"), lit(0)).cast("long").as("n_kept"),
        // nullif: a doc with no surviving spans (or none to begin
        // with) must not gain a leading space from the empty body slot
        md5(concat_ws(" ",
          nullif(coalesce(col("body"), lit("")), lit("")), col("tail")))
          .as("content_hash"))
  }

  private def spanDedupQuery(s: SparkSession, dir: String): DataFrame =
    dedupSpans(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** Rich-corpus twin: the planted near-dup groups share most tokens
    * position-for-position, so a large fraction of spans (~60%) are
    * genuine cross-document duplicates — the selectivity regime the
    * flat corpus can't produce.
    */
  private def spanDedupRichQuery(s: SparkSession, dir: String): DataFrame =
    dedupSpans(Tables.richDocumentsStaged(s, dir)).orderBy(col("doc_id"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_span_dedup" -> (spanDedupQuery _),
    "q_span_dedup_rich" -> (spanDedupRichQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_span_dedup_rich" -> graft.Tables.richOracle(
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), chunks AS (
        |  SELECT doc_id, i AS ci,
        |    array_to_string(w[(i*10+1):(i*10+10)], ' ') AS span
        |  FROM words,
        |    LATERAL unnest(generate_series(0, (len(w)//10) - 1)) AS t(i)
        |), ranked AS (
        |  SELECT doc_id, ci, span,
        |    row_number() OVER (PARTITION BY span ORDER BY doc_id, ci) AS rk
        |  FROM chunks
        |), kept AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(span, ' ' ORDER BY ci) AS body
        |  FROM ranked WHERE rk = 1 GROUP BY doc_id
        |), tails AS (
        |  SELECT doc_id, CAST((len(w)//10) AS BIGINT) AS n_spans,
        |    CASE WHEN len(w) % 10 = 0 THEN NULL
        |      ELSE array_to_string(w[((len(w)//10)*10+1):len(w)], ' ')
        |    END AS tail
        |  FROM words
        |)
        |SELECT t.doc_id, t.n_spans,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  md5(concat_ws(' ', nullif(COALESCE(k.body, ''), ''), t.tail)) AS content_hash
        |FROM tails t LEFT JOIN kept k ON t.doc_id = k.doc_id
        |ORDER BY t.doc_id""".stripMargin),
    "q_span_dedup" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), chunks AS (
        |  SELECT doc_id, i AS ci,
        |    array_to_string(w[(i*10+1):(i*10+10)], ' ') AS span
        |  FROM words,
        |    LATERAL unnest(generate_series(0, (len(w)//10) - 1)) AS t(i)
        |), ranked AS (
        |  SELECT doc_id, ci, span,
        |    row_number() OVER (PARTITION BY span ORDER BY doc_id, ci) AS rk
        |  FROM chunks
        |), kept AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(span, ' ' ORDER BY ci) AS body
        |  FROM ranked WHERE rk = 1 GROUP BY doc_id
        |), tails AS (
        |  SELECT doc_id, CAST((len(w)//10) AS BIGINT) AS n_spans,
        |    CASE WHEN len(w) % 10 = 0 THEN NULL
        |      ELSE array_to_string(w[((len(w)//10)*10+1):len(w)], ' ')
        |    END AS tail
        |  FROM words
        |)
        |SELECT t.doc_id, t.n_spans,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  md5(concat_ws(' ', nullif(COALESCE(k.body, ''), ''), t.tail)) AS content_hash
        |FROM tails t LEFT JOIN kept k ON t.doc_id = k.doc_id
        |ORDER BY t.doc_id""".stripMargin)
}
