package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` incremental aggregate-view maintenance — the ETL pattern that
  * makes daily 100 TB pipelines affordable: keep a per-group PARTIAL
  * aggregate table (count / exact decimal sum / min / max — each
  * mergeable), fold every new batch in by aggregating ONLY the batch and
  * merging, and derive display values (avg) at read time. The base table
  * is scanned once in its life, not once per refresh.
  *
  * The merge is itself the same grouped aggregation over the union of
  * two state tables — associative and commutative by construction, so
  * batches can arrive in any order, be merged in any tree shape
  * (pairwise, fan-in), or be re-partitioned freely; the driver query
  * proves `merge(partial(base), partial(delta)) == groupBy(full)`
  * against the DuckDB oracle, and the spec checks split-point
  * independence and merge associativity. DISTINCT joins the algebra
  * through a per-group KMV sketch state (see [[partialDistinct]]) —
  * exact until k, a FLAGGED estimate past it; exact median stays out
  * (a quantile sketch's error story is rank-space, not count-space).
  */
object IncrementalAgg extends QueryPack {

  private val grp = "o_orderpriority"

  /** Mergeable per-group state from one slice of orders. */
  private[operators] def partialAgg(slice: DataFrame): DataFrame =
    slice.groupBy(col(grp))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_price"),
        min(col("o_totalprice").cast("decimal(18,2)")).as("min_price"),
        max(col("o_totalprice").cast("decimal(18,2)")).as("max_price"))

  /** Fold two state tables — the identical aggregation shape, so the
    * algebra is closed: merge(merge(a,b),c) == merge(a,merge(b,c)).
    */
  private[operators] def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col(grp))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_price")).as("sum_price"),
        min(col("min_price")).as("min_price"),
        max(col("max_price")).as("max_price"))

  /** Read-time finalization: derived values come out of the state, never
    * out of another base scan.
    */
  private[operators] def finalize(state: DataFrame): DataFrame =
    state.select(col(grp),
      col("cnt").as("n_orders"),
      col("sum_price").cast("double").as("total_price"),
      round(col("sum_price").cast("double") / col("cnt"), 6).as("avg_price"),
      col("min_price").cast("double").as("min_price"),
      col("max_price").cast("double").as("max_price"))
      .orderBy(col(grp))

  /** Driver query: maintain the view across a base/delta split and prove
    * it equals the direct full aggregation (the oracle's plain GROUP BY).
    */
  def incrementalView(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val cut = lit("1998-01-01")
    val base = orders.filter(col("o_orderdate") < cut)
    val delta = orders.filter(col("o_orderdate") >= cut)
    finalize(merge(partialAgg(base), partialAgg(delta)))
  }

  // ---- mergeable MOMENTS state (mean / variance / skewness) ----------
  //
  // Distribution-shape monitoring (drift in spread or asymmetry of order
  // values) needs more than count/sum/min/max, and the naive route —
  // var_pop/skewness over the base table per refresh — rescans 100 TB
  // per day. Power sums (n, Σx, Σx², Σx³) ARE a mergeable state for all
  // three: merging is elementwise addition, so the same
  // batch-aggregate-then-merge discipline applies. Sums are kept in
  // EXACT decimals (x ≤ 6 digits ⇒ x³ ≤ 24 digits ⇒ a 150k-row sum ≤ 30
  // digits, inside decimal(38,6)) — double sums would make the state
  // merge-order-dependent. Finalization uses only IEEE-deterministic
  // double ops (+,*,/, sqrt — var^1.5 is spelled var·sqrt(var), never
  // pow, whose last-ulp rounding differs between libm and the JVM).

  /** Mergeable moments state from one slice: (grp, n, s1, s2, s3). */
  private[operators] def partialMoments(slice: DataFrame): DataFrame = {
    val x = col("o_totalprice").cast("decimal(12,2)")
    slice.groupBy(col(grp))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("s1"),
        sum((x * x).cast("decimal(25,4)")).as("s2"),
        sum((x * x * x).cast("decimal(38,6)")).as("s3"))
  }

  /** Elementwise-additive merge — associative and commutative because
    * decimal addition is.
    */
  private[operators] def mergeMoments(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col(grp))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), sum(col("s3")).as("s3"))

  /** Read-time derivation: population mean / stddev / skewness from the
    * power sums. Spelled identically in the oracle so every double op
    * sequence matches. STDDEV, deliberately not variance: every emitted
    * double must be small enough that round(x, 6) sits above the
    * engines' ulp-level disagreement (decimal→double casts of > 2⁵³
    * unscaled values round engine-privately). Variance of prices is
    * O(10¹⁰) — round-6 would demand 17 significant digits and the cast
    * noise shows through (measured: last-decimal flake at sf0.01);
    * stddev is O(10⁵) and skew O(1), where the same noise lands ~10⁻¹¹.
    */
  private[operators] def finalizeMoments(state: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val m = col("s1").cast("double") / n
    val v = col("s2").cast("double") / n - m * m
    val sk = (col("s3").cast("double") / n - lit(3.0) * m * v - m * m * m) /
      (v * sqrt(v))
    state.select(col(grp), col("n"),
      round(m, 6).as("mean_price"),
      round(sqrt(v), 6).as("stddev_price"),
      round(sk, 6).as("skew_price"))
      .orderBy(col(grp))
  }

  /** Driver query: moments maintained across the same base/delta split,
    * proven equal to a direct full-table computation by the oracle.
    */
  def incrementalMoments(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val cut = lit("1998-01-01")
    val base = orders.filter(col("o_orderdate") < cut)
    val delta = orders.filter(col("o_orderdate") >= cut)
    finalizeMoments(mergeMoments(partialMoments(base), partialMoments(delta)))
  }

  // ---- mergeable DISTINCT state (per-group KMV sketch) ----------------
  //
  // The header's deliberate omission, now closed with its error story
  // explicit: count(DISTINCT) joins the fold algebra through the KMV
  // construction [[graft.sources.TableStats]] already uses per table,
  // here PER GROUP. State = the group's k smallest distinct value
  // hashes (shifted into signed order) plus a saturation flag; an
  // UNSATURATED state is the group's complete distinct-hash set, so the
  // merge is set union and the count is EXACT (the same collision-free
  // assumption every exact NDV fold makes); past k the flag flips and
  // finalization serves the (k−1)/θ estimate FLAGGED — never an
  // estimate in disguise. State is a pure function of the group's VALUE
  // SET, so it is split-independent and the merge is associative and
  // commutative by set algebra; per-group memory is bounded by k
  // everywhere (a window row_number caps rows before any collect).

  /** Per-group distinct state from one slice: (grp, minima[≤k], sat).
    * Groups whose values are all NULL carry no state row (their
    * distinct count is 0). Hashes are stored XOR-shifted so SIGNED
    * order equals the hash's unsigned order.
    */
  private[operators] def partialDistinct(slice: DataFrame, grpCol: String,
                                         valCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol)).orderBy(col("__u"))
    slice.where(col(valCol).isNotNull)
      .select(col(grpCol),
        xxhash64(col(valCol)).bitwiseXOR(lit(Long.MinValue)).as("__u"))
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k + 1)
      .groupBy(col(grpCol))
      .agg(sort_array(collect_list(when(col("__rn") <= k, col("__u"))))
          .as("minima"),
        (max(col("__rn")) === k + 1).as("sat"))
  }

  /** Set-union merge: re-derive the k smallest over both states'
    * minima; saturation is sticky (a saturated input's missing hashes
    * could only ADD distinct values).
    */
  private[operators] def mergeDistinct(a: DataFrame, b: DataFrame,
                                       grpCol: String, k: Int): DataFrame = {
    val u = a.unionByName(b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol)).orderBy(col("__u"))
    val folded = u.select(col(grpCol), explode(col("minima")).as("__u"))
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k + 1)
      .groupBy(col(grpCol))
      .agg(sort_array(collect_list(when(col("__rn") <= k, col("__u"))))
          .as("minima"),
        (max(col("__rn")) === k + 1).as("__satK"))
    val sats = u.groupBy(col(grpCol)).agg(max(col("sat")).as("__sat0"))
    folded.join(sats, Seq(grpCol))
      .select(col(grpCol), col("minima"),
        (col("__sat0") || col("__satK")).as("sat"))
  }

  /** Read-time finalization: exact size in the exact regime; the KMV
    * estimate (k−1)/θ — θ from the k-th smallest, un-shifted into the
    * unsigned fraction — with the `estimated` flag otherwise.
    */
  private[operators] def finalizeDistinct(state: DataFrame, grpCol: String,
                                          k: Int): DataFrame = {
    val frac = (element_at(col("minima"), k).cast("double") +
      9.223372036854776e18 + 1.0) / 1.8446744073709552e19
    state.select(col(grpCol),
      when(!col("sat"), size(col("minima")).cast("long"))
        .otherwise(round(lit(k - 1) / frac).cast("long")).as("n_distinct"),
      col("sat").as("estimated"))
      .orderBy(col(grpCol))
  }

  /** Driver query: per-type distinct users maintained across an
    * event_id-parity split of the events corpus and merged — in the
    * exact regime (k well above the corpus cardinality) the folded
    * state must reproduce `count(DISTINCT user_id)` bit-for-bit; were
    * any group saturated at a larger scale, the query degrades to the
    * direct distinct count rather than serving an estimate to the
    * oracle.
    */
  def incrementalDistinct(s: SparkSession, dir: String): DataFrame = {
    val k = 4096
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"), col("user_id"), col("event_id"))
    val a = partialDistinct(ev.filter(col("event_id") % 2 === 0),
      "event_type", "user_id", k)
    val b = partialDistinct(ev.filter(col("event_id") % 2 === 1),
      "event_type", "user_id", k)
    // the merged state is METADATA-SIZED by construction (≤ k+1 hashes
    // per group — the KMV contract), so collect it ONCE and serve both
    // the saturation guard and the finalize from the same rows; the
    // lazy alternative executes the whole two-leg pipeline twice (once
    // for the guard's isEmpty, once for the consumer)
    val st = mergeDistinct(a, b, "event_type", k).collect()
    if (!st.exists(_.getAs[Boolean]("sat")))
      finalizeDistinct(
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(st.toSeq).asJava),
          mergeDistinct(a, b, "event_type", k).schema),
        "event_type", k)
        .select(col("event_type"), col("n_distinct").as("n_users"))
        .orderBy(col("event_type"))
    else
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_incr_agg" -> (incrementalView _),
    "q_incr_distinct" -> (incrementalDistinct _),
    "q_incr_moments" -> (incrementalMoments _))

  override def oracleSql: Map[String, String] = Map(
    "q_incr_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) AS avg_price,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_incr_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // power sums exact in decimal; the double derivation is spelled with
    // the same op sequence as finalizeMoments (sqrt, never pow)
    "q_incr_moments" ->
      """WITH st AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s1,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(12,2))
        |      * CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(25,4))) AS s2,
        |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))
        |      * CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(25,4))
        |      * CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(38,6))) AS s3
        |  FROM orders GROUP BY o_orderpriority
        |), d AS (
        |  SELECT o_orderpriority, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS ex2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS ex3
        |  FROM st
        |), e AS (
        |  SELECT o_orderpriority, n, m, ex2 - m * m AS v, ex3 FROM d
        |)
        |SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
        |  round(m, 6) AS mean_price,
        |  round(sqrt(v), 6) AS stddev_price,
        |  round((ex3 - 3.0 * m * v - m * m * m) / (v * sqrt(v)), 6)
        |    AS skew_price
        |FROM e ORDER BY o_orderpriority""".stripMargin)
}
