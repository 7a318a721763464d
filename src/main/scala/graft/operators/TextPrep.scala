package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` corpus preparation operators a training-data pipeline runs
  * BEFORE dedup/quality gating: PII redaction, text normalization, and
  * per-stratum rate-based downsampling (the mixture-rebalancing knob that
  * complements [[CorpusCuration.budgetedMix]]'s token budgets).
  *
  * Scale shape: all three are embarrassingly parallel narrow maps (regex /
  * string expressions inside whole-stage codegen — no UDFs, no shuffle
  * except the final bounded ORDER BY for driver display). Regexes are
  * written in the RE2-compatible subset (no backrefs, no lookaround) so
  * the Java-regex execution here and the RE2-based DuckDB oracle match
  * byte-for-byte — which is also what keeps them portable to other
  * engines at serve time.
  */
object TextPrep extends QueryPack {

  /** ASCII-safe PII patterns, deliberately in the RE2 ∩ java.util.regex
    * common subset. Order matters at redaction time: emails first (they
    * contain dots and digits), then IPs, then phones.
    */
  private[operators] val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private[operators] val IpRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[operators] val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Redact emails → [EMAIL], IPv4s → [IP], phones → [PHONE]; returns the
    * redacted column. Counting happens on the pre-redaction text so the
    * three categories report independently.
    */
  private[operators] def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        IpRe, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Driver query: the synthetic corpus carries no PII, so the query
    * first INJECTS deterministic synthetic identifiers derived from
    * doc_id (an email, an IP, a phone — plus the raw text), then redacts
    * and reports per-category match counts and the redacted-text
    * fingerprint. The injection is part of the oracle-checked contract:
    * DuckDB must reproduce injection, counting, and redaction exactly,
    * which pins the regex semantics rather than vacuously matching on an
    * all-zero report.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      col("text"),
      lit(" contact user"), col("doc_id"), lit("@mail.example.com"),
      lit(" ip 10."), col("doc_id") % 200, lit(".0.1"),
      lit(" call 555-"), lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"),
      lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    Tables.documents(s, dir)
      .select(col("doc_id"), injected.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(IpRe), lit(0)))
          .cast("long").as("n_ips"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(redact(col("t")).cast("binary")).as("redacted_fp"))
      .orderBy(col("doc_id"))
      .limit(20)
  }

  /** Canonical text normalization (the first pass of every web-corpus
    * pipeline): lowercase, collapse runs of ASCII whitespace to one
    * space, trim. Reports per-doc before/after lengths plus the
    * normalized fingerprint — the key exact dedup should really group on
    * (md5 of the NORMALIZED text catches case/whitespace near-copies that
    * raw fingerprints miss). The whitespace class is the explicit
    * `[ \t\n\r]` — Java's `\s` and RE2's `\s` disagree on `\x0B`, and an
    * oracle-checked operator can't ride on dialect luck.
    */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        trim(regexp_replace(lower(col("text")), "[ \\t\\n\\r]+", " ")).as("norm"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(col("norm")).cast("long").as("n_chars_norm"),
        md5(col("norm").cast("binary")).as("norm_fp"))
      .orderBy(col("doc_id"))
      .limit(20)

  /** Per-stratum rate-based downsampling — corpus mixture rebalancing
    * (e.g. cut the dominant language to 25% while keeping low-resource
    * languages whole). Membership = md5(doc_id) bucket < rate·100: a pure
    * function of the id, so the SAME docs survive under any partitioning,
    * any engine, any run — an auditable split, not an rng draw. One
    * narrow filter; no shuffle until the bounded display sort. Unlisted
    * strata get `defaultPct`.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
      16, 10).cast("long") % 100
    val threshold = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    docs.withColumn("bucket", bucket)
      .filter(col("bucket") < threshold)
  }

  private val SamplePct = Map("en" -> 25, "zh" -> 50, "es" -> 50, "de" -> 50)

  /** Driver query: rebalance the documents corpus (en→25%, zh/es/de→50%,
    * default 100%) and emit the surviving (doc_id, lang, bucket) rows —
    * row-level output so the oracle pins membership, not just counts.
    */
  def stratifiedSampleQuery(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(s, dir), "lang", SamplePct, defaultPct = 100)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Weighted sampling without replacement, Efraimidis–Spirakis (2006):
    * key each row with −ln(u)/w for u ~ md5-uniform in (0,1) and take the
    * bottom-k — the standard one-pass distributed weighted reservoir
    * (exactly the math, with the rng replaced by the [[graft.operators
    * .Profiling.dpCounts]] md5-uniform so membership is a pure function
    * of (seed, id) and the oracle reproduces it). Weight = token count:
    * long documents proportionally likelier, the importance-sampling knob
    * corpus mixers use between pure rates and hard token budgets.
    * Bottom-k is TakeOrderedAndProject — no global sort, no reducer owns
    * more than k rows.
    */
  def weightedSample(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val u = (conv(substring(md5(
      concat(lit("ws1:"), col("doc_id").cast("string")).cast("binary")), 1, 8),
      16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        u.as("u"))
      .select(col("doc_id"), col("n_tokens"),
        round(-log(col("u")) / col("n_tokens"), 9).as("es_key"))
      .orderBy(col("es_key"), col("doc_id"))
      .limit(k)
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_pii_redact"        -> (piiRedact _),
    "q_text_normalize"    -> (textNormalize _),
    "q_stratified_sample" -> (stratifiedSampleQuery _),
    "q_weighted_sample"   -> ((s, d) => weightedSample(s, d)))

  override def oracleSql: Map[String, String] = Map(
    "q_pii_redact" -> {
      // single line: a leading "||" on a continuation line would lose a
      // pipe to the outer template's stripMargin
      val inject = "text || ' contact user' || doc_id::VARCHAR || '@mail.example.com'" +
        " || ' ip 10.' || (doc_id % 200)::VARCHAR || '.0.1'" +
        " || ' call 555-' || lpad((doc_id % 900 + 100)::VARCHAR, 3, '0')" +
        " || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
      s"""WITH t AS (SELECT doc_id, $inject AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$IpRe')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$EmailRe', '[EMAIL]', 'g'),
         |    '$IpRe', '[IP]', 'g'),
         |    '$PhoneRe', '[PHONE]', 'g')) AS redacted_fp
         |FROM t ORDER BY doc_id LIMIT 20""".stripMargin
    },
    "q_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_raw,
        |  CAST(length(norm) AS BIGINT) AS n_chars_norm,
        |  md5(norm) AS norm_fp
        |FROM n ORDER BY doc_id LIMIT 20""".stripMargin,
    "q_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE lang
        |  WHEN 'en' THEN 25 WHEN 'zh' THEN 50 WHEN 'es' THEN 50
        |  WHEN 'de' THEN 50 ELSE 100 END
        |ORDER BY doc_id""".stripMargin,
    "q_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    (CAST(('0x' || substring(md5('ws1:' || doc_id::VARCHAR), 1, 8))
        |      AS BIGINT) + 0.5) / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id, n_tokens, round(-ln(u) / n_tokens, 9) AS es_key
        |FROM w ORDER BY es_key, doc_id LIMIT 20""".stripMargin)
}
