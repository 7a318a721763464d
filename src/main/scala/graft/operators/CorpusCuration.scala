package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.SampleKExpr

/** `[EXT]` corpus-curation operators — the decision layer of a
  * training-data pipeline, downstream of scoring/dedup and upstream of
  * training:
  *
  *  - **budgeted mixture sampling** ([[budgetedMix]]): sample each
  *    stratum (lang/source/domain) down to a TOKEN budget — the "data
  *    mixing" step that turns corpus proportions into a training recipe;
  *  - **quality-rule gate** ([[qualityRules]]): thresholded keep/drop
  *    decisions in the published Gopher/C4 rule family (length, mean
  *    word length, stopword presence, repetition, symbol ratio);
  *  - **BPE merge-step pair counts** ([[bpePairCounts]]): the inner
  *    primitive of byte-pair-encoding tokenizer training — count
  *    adjacent symbol pairs within words across the corpus, rank by
  *    frequency.
  *
  * All three are single-scan shapes: narrow per-row expressions followed
  * by one hash aggregation (or one window over the stratum), nothing
  * quadratic, no UDF in the hot path — at 100 TB each is a map-side-
  * combined pass over the documents table.
  */
object CorpusCuration extends QueryPack {

  private val mixSeed = 42L
  private val mixBudget = 400L

  /** Budgets up to this many tokens take the bottom-k heap pre-prune path
    * (the per-group sketch buffer allocates k slots eagerly; ~4M × 40 B ≈
    * 160 MB is the ceiling we accept per aggregation buffer). Budgets
    * beyond it — billions of tokens per stratum — take the
    * [[thresholdCandidates]] priority-threshold prune instead: no heap,
    * two map-side-combined aggregations, same result.
    */
  private val maxPruneK: Long = 1L << 22

  /** Pre-window candidate set for [[budgetedMix]]: each stratum pruned to
    * its bottom-`budgetTokens` docs by the md5("seed:id") priority, via the
    * [[SampleKExpr]] bottom-k aggregate (map-side k-bounded heaps, one
    * shuffle of k-sized buffers on the stratum key).
    *
    * Why pruning is result-preserving: every doc carries ≥ 1 token
    * (`split` never returns an empty array), so a row surviving
    * `cum_tokens <= budgetTokens` has at most `budgetTokens` rows at or
    * before it in the (pri, id) order — i.e. every survivor sits inside
    * the bottom-`budgetTokens` PREFIX of the stratum's sort order, and a
    * prefix prune leaves each survivor's running sum unchanged. Without
    * this prune a dominant stratum (lang='en' on a web corpus) funnels
    * nearly the whole table through ONE window reducer; with it the
    * window sees ≤ budgetTokens rows per stratum at any corpus size.
    *
    * The joined-back candidate side is ≤ budget·n_strata rows — AQE
    * broadcasts it, so the corpus side is never shuffled for the join.
    */
  private[graft] def mixCandidates(docs: DataFrame, idCol: String, textCol: String,
                                   stratumCol: String, budgetTokens: Long,
                                   seed: Long): DataFrame = {
    val narrow = docs.select(col(stratumCol), col(idCol).cast("long").as(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    if (budgetTokens > maxPruneK) {
      thresholdCandidates(narrow, idCol, stratumCol, budgetTokens, seed)
    } else {
      // SampleKExpr's priority IS md5("seed:id") with the same (pri, id)
      // tie-break as the window's ORDER BY, so its kept set is exactly the
      // bottom-k prefix of the stratum order
      val kept = narrow.groupBy(col(stratumCol))
        .agg(SampleKExpr(col(idCol), seed, budgetTokens.toInt).as("kept"))
        .select(col(stratumCol).as("__mix_stratum"), explode(col("kept")).as("kv"))
        .select(col("__mix_stratum"), col("kv.id").as("__mix_id"),
          col("kv.pri").as("pri"))
      kept.join(narrow,
          kept("__mix_stratum") <=> narrow(stratumCol) &&
            kept("__mix_id") === narrow(idCol))
        .select(col(stratumCol), col(idCol), col("n_tokens"), col("pri"))
    }
  }

  /** Heap-free pre-prune for budgets past [[maxPruneK]]: bucket the
    * priority space by its first 4 hex chars (65 536 order-preserving
    * prefix buckets), prefix-sum per-bucket token totals per stratum, and
    * keep only buckets whose PRECEDING cumulative total is still under
    * the budget.
    *
    * Result-preserving: priorities sort lexicographically and buckets are
    * priority PREFIXES, so every doc in an earlier bucket precedes every
    * doc in a later one in the window's (pri, id) order. A row in bucket
    * b therefore has cum_tokens ≥ (tokens of all buckets before b) + 1 —
    * if that preceding total already reaches the budget, the row cannot
    * survive the `cum_tokens <= budget` filter, so dropping bucket b
    * whole is exact. What remains per stratum is ≤ budget tokens plus one
    * bucket (~1/65536 of the stratum): the exact window runs over that,
    * never the whole stratum.
    *
    * Cost: two hash aggregations (both map-side combined; the per-bucket
    * table is ≤ 65 536 rows per stratum) + a window over that tiny table
    * + one semi-join back — no 160 MB heap buffers, no budget-sized
    * aggregation state, valid for ANY budget.
    */
  private[graft] def thresholdCandidates(narrow: DataFrame, idCol: String,
                                         stratumCol: String, budgetTokens: Long,
                                         seed: Long): DataFrame = {
    val withPri = narrow.withColumn("pri",
        md5(concat(lit(seed.toString + ":"), col(idCol).cast("string")).cast("binary")))
      .withColumn("__pb", substring(col("pri"), 1, 4))
    val wB = Window.partitionBy(col("__s")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val liveBuckets = withPri
      .groupBy(col(stratumCol).as("__s"), col("__pb").as("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__before", coalesce(sum(col("__bt")).over(wB), lit(0L)))
      .filter(col("__before") < budgetTokens)
      .select(col("__s"), col("__b"))
    withPri.join(liveBuckets,
        withPri(stratumCol) <=> liveBuckets("__s") &&
          withPri("__pb") === liveBuckets("__b"), "left_semi")
      .select(col(stratumCol), col(idCol), col("n_tokens"), col("pri"))
  }

  /** Deterministic token-budget sampling per stratum: order the stratum's
    * docs by md5("seed:doc_id") priority (the [[graft.functions.SampleKExpr]]
    * priority — membership is a pure function of (seed, id), auditable by
    * any md5-bearing engine) and keep docs while the running token total
    * stays within the budget. Output size is budget-bound, not
    * corpus-bound: the same query returns ~budget tokens per stratum at
    * any scale. The stratum is pre-pruned to its bottom-`budgetTokens`
    * candidates BEFORE the running-sum window (see [[mixCandidates]] for
    * the proof), so no stratum — however dominant — pushes more than
    * `budgetTokens` rows through a single window reducer.
    */
  def budgetedMix(docs: DataFrame, idCol: String, textCol: String,
                  stratumCol: String, budgetTokens: Long = mixBudget,
                  seed: Long = mixSeed): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("pri"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixCandidates(docs, idCol, textCol, stratumCol, budgetTokens, seed)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
  }

  def mixQuery(s: SparkSession, dir: String): DataFrame =
    budgetedMix(Tables.documents(s, dir), "doc_id", "text", "lang")
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("doc_id"))

  /** Per-document quality-rule flags — the row-level decision layer shared
    * by the per-language summary ([[qualityRules]]) and the curated-corpus
    * materialization ([[CuratedCorpus]]). Adds the five `ok_*` booleans and
    * the combined `keep` to `docs`; all narrow expressions, no shuffle.
    */
  private[graft] def qualityFlags(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to")
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("word_chars",
        aggregate(transform(col("toks"), t => length(t)), lit(0), (a, x) => a + x)
          .cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isInCollection(stop))).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("clean_len",
        length(regexp_replace(col("text"), "[^a-z0-9 ]", "")).cast("long"))
      .withColumn("ok_len", col("n_words").between(5, 500))
      // mean word length in [3, 12]: integer cross-multiplied, no division
      .withColumn("ok_mwl",
        col("word_chars") >= col("n_words") * 3 && col("word_chars") <= col("n_words") * 12)
      .withColumn("ok_stop", col("n_stop") >= 1)
      // repetition: at least half the tokens distinct
      .withColumn("ok_rep", col("n_distinct") * 2 >= col("n_words"))
      // symbol ratio ≤ 10%: non-[a-z0-9 ] chars are at most 1/10 of chars
      .withColumn("ok_sym",
        (length(col("text")) - col("clean_len")) * 10 <= length(col("text")))
      .withColumn("keep",
        col("ok_len") && col("ok_mwl") && col("ok_stop") && col("ok_rep") && col("ok_sym"))
  }

  /** Gopher/C4-family quality rules, summarized per language: how many
    * docs fail each rule and how many survive all of them. Thresholds are
    * tuned to this corpus's shape (short synthetic docs) — the OPERATOR is
    * the point: per-row boolean columns ([[qualityFlags]]) folded in one
    * conditional-agg pass, the decision layer a 100 TB curation run
    * executes before training.
    */
  def qualityRules(s: SparkSession, dir: String): DataFrame = {
    qualityFlags(Tables.documents(s, dir))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("ok_len"), 1L).otherwise(0L)).as("fail_len"),
        sum(when(!col("ok_mwl"), 1L).otherwise(0L)).as("fail_mwl"),
        sum(when(!col("ok_stop"), 1L).otherwise(0L)).as("fail_stop"),
        sum(when(!col("ok_rep"), 1L).otherwise(0L)).as("fail_rep"),
        sum(when(!col("ok_sym"), 1L).otherwise(0L)).as("fail_sym"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        round(sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
              count(lit(1)).cast("double"), 6).as("keep_rate"))
      .orderBy(col("lang"))
  }

  /** Gopher's REPETITION rule proper — the duplicate word-n-gram
    * character fraction (the "fraction of characters in duplicated
    * 3-grams" family), the published repetition signal the coarse
    * distinct-token ratio in [[qualityFlags]] approximates. Entirely
    * NARROW: the trigram list, the duplicate scan, and both character
    * sums are per-row higher-order functions (quadratic only within a
    * document's own trigram list), so at 100 TB the query is one scan
    * plus a 5-row language aggregate — no shuffle carries grams. All
    * integers until one terminal division; `n_flagged` (> 10% duplicated
    * chars) is an integer cross-multiply.
    */
  def repetitionReport(s: SparkSession, dir: String): DataFrame =
    repetitionReportFor(Tables.documents(s, dir))

  /** [[repetitionReport]] over an explicit corpus frame (spec entry point). */
  private[graft] def repetitionReportFor(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("grams", expr(
        "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) " +
          "ELSE array() END"))
      .withColumn("tot_chars", expr(
        "aggregate(grams, 0L, (a, g) -> a + length(g))"))
      .withColumn("dup_chars", expr(
        "aggregate(array_distinct(grams), 0L, (a, g) -> a + " +
          "CASE WHEN size(filter(grams, x -> x = g)) > 1 " +
          "THEN CAST(length(g) * size(filter(grams, x -> x = g)) AS BIGINT) " +
          "ELSE 0L END)"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("dup_chars")).as("dup_chars"),
        sum(col("tot_chars")).as("tot_chars"),
        round(sum(col("dup_chars")).cast("double") /
          nullif(sum(col("tot_chars")), lit(0L)).cast("double"), 6).as("dup_rate"),
        sum(when(col("dup_chars") * 10 > col("tot_chars"), 1L).otherwise(0L))
          .as("n_flagged"))
      .orderBy(col("lang"))

  /** The BPE training inner step: count adjacent character pairs WITHIN
    * words (word boundaries never merge) across the corpus and rank the
    * top candidates — at iteration 0 the symbols are single characters,
    * and the top row is exactly the first merge a BPE trainer would
    * perform. explode + hash-agg + top-k: one scan, one shuffle on the
    * 2-char pair key, TakeOrderedAndProject for the limit.
    */
  def bpePairCounts(s: SparkSession, dir: String, topK: Int = 50): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)

  /** DuckDB mirror of [[qualityFlags]] — per-doc `ok_*` booleans, shared
    * by the `q_quality_rules` oracle and the curated-corpus oracle
    * ([[CuratedCorpus.oracleSql]]). Expressions replicate the engine's
    * integer-only rule arithmetic exactly.
    */
  private[operators] val qualityRowsSql: String =
    """  SELECT doc_id, lang,
      |    (n_words BETWEEN 5 AND 500) AS ok_len,
      |    (word_chars >= n_words * 3 AND word_chars <= n_words * 12) AS ok_mwl,
      |    (n_stop >= 1) AS ok_stop,
      |    (n_distinct * 2 >= n_words) AS ok_rep,
      |    ((n_chars_t - clean_len) * 10 <= n_chars_t) AS ok_sym
      |  FROM (
      |    SELECT doc_id, lang,
      |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |      CAST(list_sum(list_transform(string_split(text, ' '), t -> len(t)))
      |        AS BIGINT) AS word_chars,
      |      CAST(len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS BIGINT) AS n_stop,
      |      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |      CAST(length(text) AS BIGINT) AS n_chars_t,
      |      CAST(length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS clean_len
      |    FROM documents
      |  )""".stripMargin

  /** ITERATED BPE training — the real tokenizer-trainer loop, not just
    * the iteration-0 pair count of [[bpePairCounts]]: `rounds` times,
    * (1) count adjacent symbol-pair occurrences across the corpus
    * (overlapping positions, weighted by word frequency — the classic
    * Sennrich counting), (2) pick the most frequent pair (total
    * tiebreak: count desc, then lhs/rhs asc — integer-only, so the
    * argmax is deterministic under ANY partitioning), (3) re-segment
    * every word by greedy leftmost-first non-overlapping merge, and
    * recount. Returns the merge TABLE — (merge_round, lhs, rhs, n) — the
    * artifact a BPE trainer ships.
    *
    * Scale design: the loop runs over the WORD-FREQUENCY table, not the
    * corpus — one corpus scan builds (word, count), and every subsequent
    * round is vocab-sized (bounded in the millions at any corpus size —
    * the standard scalable-BPE shape). Re-segmentation is a codegen'd
    * `aggregate` fold over the symbol array (greedy scan semantics: the
    * merged token `lhs+rhs` is strictly longer than `lhs`, so it can
    * never falsely chain into the next merge — see the spec's "aaaa"
    * case). Per-round `localCheckpoint` truncates the growing lineage
    * (the [[DedupClusters]] pattern); only the 1-row argmax is collected
    * per round.
    */
  def bpeMerges(s: SparkSession, dir: String, rounds: Int = 6): DataFrame =
    bpeMergesFor(Tables.documents(s, dir), rounds)

  /** [[bpeMerges]] over an explicit corpus frame (spec entry point). */
  private[graft] def bpeMergesFor(docs: DataFrame, rounds: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      // filter guards against any empty-string artifacts of the char split
      .select(expr("filter(split(w, ''), c -> c <> '')").as("syms"), col("n"))
      // LAZY: each round's 1-row argmax collect materializes the state
      // it reads — one job per round instead of two (plan stays truncated)
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    for (round <- 1 to rounds) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i - 1] AS lhs, syms[i] AS rhs))")).as("p"), col("n"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("n")).as("pn"))
        .orderBy(col("pn").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(top.nonEmpty, s"BPE merge round $round: no pairs left (corpus too small)")
      val (lhs, rhs, pn) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((round.toLong, lhs, rhs, pn))
      words = words.select(greedyMerge(col("syms"), lhs, rhs).as("syms"), col("n"))
        .localCheckpoint(false)
    }
    merges.toSeq.toDF("merge_round", "lhs", "rhs", "n").orderBy(col("merge_round"))
  }

  /** Greedy leftmost-first non-overlapping merge of (lhs, rhs) in a
    * symbol array — a codegen'd `aggregate` fold. Equivalent to the
    * classic i/i+1 scan: the merged token `lhs+rhs` is strictly longer
    * than `lhs`, so it can never falsely chain into the following `rhs`.
    */
  private[graft] def greedyMerge(syms: org.apache.spark.sql.Column, lhs: String,
                          rhs: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, sym) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(lhs) && sym === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(sym))))

  /** APPLY the trained tokenizer — the other half of the BPE loop: train
    * the merge table ([[bpeMergesFor]], vocab-sized), then re-segment the
    * CORPUS with it (the distributed half: `rounds` chained greedy-merge
    * folds inside one scan — no shuffle until the final per-language
    * aggregate) and report per-language piece statistics. `compression`
    * is pieces/chars — the ratio a tokenizer trainer tracks per merge
    * budget; a ratio of exact ints under round(·,6) is oracle-safe.
    */
  def bpeTokenizeStats(s: SparkSession, dir: String, rounds: Int = 6): DataFrame = {
    // the merge table is the corpus's TRAINED ARTIFACT — staged once
    // per corpus fingerprint like the dedup pair sets (training itself
    // stays the live measured path of q_bpe_merges); what this query
    // measures is APPLYING the tokenizer to the corpus + the rollup
    val fit = graft.sources.Ingest.ensureStaged(
      graft.sources.Ingest.stagedPath(s, s"graft_bpe_fit${rounds}_",
        Seq(s"$dir/documents.parquet")))(tmp =>
      bpeMergesFor(Tables.documents(s, dir), rounds).write.parquet(tmp))
    val docs = Tables.documents(s, dir)
    val seg = applyMergesOnePass(
      docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .withColumn("syms", expr("filter(split(w, ''), c -> c <> '')")),
      graft.Tables.readCached(s, fit))
    seg.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(size(col("syms")).cast("long")).as("n_pieces"))
      .withColumn("compression",
        round(col("n_pieces").cast("double") / col("n_chars").cast("double"), 6))
      .orderBy(col("lang"))
  }

  /** [[bpeTokenizeStats]] over an explicit corpus frame (spec entry point). */
  private[graft] def bpeTokenizeStatsFor(docs: DataFrame, rounds: Int): DataFrame = {
    val seg = applyMergesOnePass(
      docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .withColumn("syms", expr("filter(split(w, ''), c -> c <> '')")),
      bpeMergesFor(docs, rounds))
    seg.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(size(col("syms")).cast("long")).as("n_pieces"))
      .withColumn("compression",
        round(col("n_pieces").cast("double") / col("n_chars").cast("double"), 6))
      .orderBy(col("lang"))
  }

  /** Apply a trained merge table to a segmented corpus in ONE column
    * operation — plan depth CONSTANT in merge count. The chained
    * alternative (`rounds` stacked [[greedyMerge]] folds) is fine at the
    * 6-round demo contract but adds one full `aggregate` lambda to the
    * expression tree per merge: at a production 32k-100k merge budget
    * the plan and codegen explode — a parameter-scale killer.
    *
    * Here the RANKED merge list rides as DATA: collect_list into a 1-row
    * array<struct> frame (vocab-loop-sized — rounds entries), broadcast,
    * and replayed by a single nested `aggregate`: the outer fold walks
    * merges in rank order (array_sort on the distinct merge_round key),
    * the inner fold is the same greedy leftmost-first scan as
    * [[greedyMerge]], entered only when lhs occurs in the word (the
    * array_position guard makes a non-applicable merge a cheap linear
    * scan, which at real budgets is nearly all of them). Equality with
    * the chained form — merge-by-merge replay in identical order with
    * identical fold semantics — is asserted by CorpusCurationSpec at
    * both trained and synthetic 60-merge tables.
    */
  private[graft] def applyMergesOnePass(seg: DataFrame,
                                        mergesDf: DataFrame): DataFrame = {
    val ms = mergesDf.agg(array_sort(collect_list(
      struct(col("merge_round"), col("lhs"), col("rhs")))).as("ms"))
    seg.crossJoin(broadcast(ms))
      .withColumn("syms", expr(
        """aggregate(ms, syms, (acc, m) ->
          |  IF(array_position(acc, m.lhs) = 0, acc,
          |    aggregate(acc, CAST(array() AS ARRAY<STRING>), (a2, sym) ->
          |      IF(size(a2) > 0 AND element_at(a2, -1) = m.lhs AND sym = m.rhs,
          |         concat(slice(a2, 1, size(a2) - 1), array(concat(m.lhs, m.rhs))),
          |         concat(a2, array(sym))))))""".stripMargin))
      .drop("ms")
  }

  /** The chained reference form — one [[greedyMerge]] fold per merge,
    * plan depth linear in merge count. Retained ONLY as the equality
    * baseline for [[applyMergesOnePass]]'s spec; not on any query path.
    */
  private[graft] def applyMergesChained(seg: DataFrame,
                                        merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(seg) { case (d, (lhs, rhs)) =>
      d.withColumn("syms", greedyMerge(col("syms"), lhs, rhs))
    }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_token_budget_mix" -> (mixQuery _),
    "q_quality_rules"    -> (qualityRules _),
    "q_bpe_pairs"        -> ((s, d) => bpePairCounts(s, d)),
    "q_bpe_merges"       -> ((s, d) => bpeMerges(s, d)),
    "q_bpe_tokenize"     -> ((s, d) => bpeTokenizeStats(s, d)),
    "q_rep_ngrams"       -> (repetitionReport _))

  override def oracleSql: Map[String, String] = Map(
    "q_token_budget_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    md5('$mixSeed:' || CAST(doc_id AS VARCHAR)) AS pri
         |  FROM documents
         |), c AS (
         |  SELECT lang, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY pri, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
         |  FROM t
         |)
         |SELECT lang, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= $mixBudget
         |ORDER BY doc_id""".stripMargin,
    "q_quality_rules" ->
      s"""WITH f AS (
        |$qualityRowsSql
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
        |  CAST(sum(CASE WHEN NOT ok_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mwl,
        |  CAST(sum(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
        |  CAST(sum(CASE WHEN NOT ok_rep THEN 1 ELSE 0 END) AS BIGINT) AS fail_rep,
        |  CAST(sum(CASE WHEN NOT ok_sym THEN 1 ELSE 0 END) AS BIGINT) AS fail_sym,
        |  CAST(sum(CASE WHEN ok_len AND ok_mwl AND ok_stop AND ok_rep AND ok_sym
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  round(sum(CASE WHEN ok_len AND ok_mwl AND ok_stop AND ok_rep AND ok_sym
        |    THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS keep_rate
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,
    "q_rep_ngrams" ->
      """WITH d AS (
        |  SELECT lang, string_split(text, ' ') AS t FROM documents
        |), g AS (
        |  SELECT lang,
        |    CASE WHEN len(t) >= 3 THEN [array_to_string(t[i:i+2], ' ')
        |      FOR i IN generate_series(1, len(t) - 2)] ELSE [] END AS grams
        |  FROM d
        |), c AS (
        |  SELECT lang,
        |    COALESCE(list_sum(list_transform(grams, gg -> length(gg))), 0) AS tot_chars,
        |    COALESCE(list_sum(list_transform(list_distinct(grams), gg ->
        |      CASE WHEN len(list_filter(grams, x -> x = gg)) > 1
        |      THEN length(gg) * len(list_filter(grams, x -> x = gg)) ELSE 0 END)), 0)
        |      AS dup_chars
        |  FROM g
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(dup_chars) AS BIGINT) AS dup_chars,
        |  CAST(sum(tot_chars) AS BIGINT) AS tot_chars,
        |  round(sum(dup_chars)::DOUBLE / nullif(sum(tot_chars), 0), 6) AS dup_rate,
        |  CAST(sum(CASE WHEN dup_chars * 10 > tot_chars THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    // GOLDEN-VALUE oracle (sf0.01, the driver's verify corpus): the merge
    // table is integer-only (counts + lexicographic argmax), verified
    // bit-identical across fresh JVMs at local[4]/sp=4 and local[32]/sp=32
    // (GoldenIvf probe) AND against an independent Python BPE trainer over
    // the same parquet. Round 6 merges 'm'+'er' — a round-1 product — so
    // the pinned values witness true iteration, not six iteration-0 picks.
    "q_bpe_merges" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'e', 'r', CAST(4568 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'i', 'n', CAST(2760 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'o', 'w', CAST(2747 AS BIGINT)),
        |  (CAST(4 AS BIGINT), 'o', 'r', CAST(2696 AS BIGINT)),
        |  (CAST(5 AS BIGINT), 's', 't', CAST(2676 AS BIGINT)),
        |  (CAST(6 AS BIGINT), 'm', 'er', CAST(1852 AS BIGINT))
        |) t(merge_round, lhs, rhs, n)
        |ORDER BY merge_round""".stripMargin,
    // GOLDEN-VALUE oracle (sf0.01): integer piece counts + a ratio of
    // exact ints; bit-identical across local[4]/local[32] (GoldenIvf
    // probe) and reproduced by the same independent Python trainer+
    // tokenizer that validates q_bpe_merges.
    "q_bpe_tokenize" ->
      """SELECT * FROM (VALUES
        |  ('de', CAST(3549 AS BIGINT), CAST(16046 AS BIGINT), CAST(13758 AS BIGINT), CAST(0.85741 AS DOUBLE)),
        |  ('en', CAST(11757 AS BIGINT), CAST(52898 AS BIGINT), CAST(45451 AS BIGINT), CAST(0.85922 AS DOUBLE)),
        |  ('es', CAST(3958 AS BIGINT), CAST(17871 AS BIGINT), CAST(15348 AS BIGINT), CAST(0.858822 AS DOUBLE)),
        |  ('fr', CAST(3758 AS BIGINT), CAST(16929 AS BIGINT), CAST(14539 AS BIGINT), CAST(0.858822 AS DOUBLE)),
        |  ('zh', CAST(4143 AS BIGINT), CAST(18765 AS BIGINT), CAST(16114 AS BIGINT), CAST(0.858726 AS DOUBLE))
        |) t(lang, n_words, n_chars, n_pieces, compression)
        |ORDER BY lang""".stripMargin,
    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |), p AS (
        |  SELECT unnest([substring(w, i, 2) FOR i IN generate_series(1, len(w) - 1)]) AS pair
        |  FROM w WHERE len(w) >= 2
        |)
        |SELECT pair, count(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin)
}
