package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` dataset observability — the profiling layer a 100 TB pipeline
  * runs before and between every processing stage:
  *
  *  - column profile (the "what is in this table" first query),
  *  - PSI distribution drift between two corpus slices (the train/serve
  *    shift monitor of the credit-scoring literature, re-used verbatim by
  *    ML feature pipelines),
  *  - weekly cohort retention (first-seen week × active week — the
  *    standard product-analytics matrix).
  *
  * All three are one- or two-scan aggregate shapes with no wide state:
  * profile and PSI reduce to single aggregate rows; retention is a
  * per-user min + one matrix aggregate.
  */
object Profiling extends QueryPack {

  /** Long-form numeric column profile of lineitem: null count,
    * min/max/mean per measure column. ONE pass, one 1-row aggregate, NO
    * Expand: the routine always-on profile must not pay cardinality's
    * cost. Exact distinct counts live in [[profileDistinct]] — multiple
    * `count_distinct`s in one aggregate make Catalyst replicate the fact
    * scan once per distinct column through an Expand (measured as the
    * r5→r6 bench regression when they sat here), which is the wrong
    * default plan at 100 TB.
    */
  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_mean"))
    }
    val one = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    // stack takes a FLAT argument list (k groups laid out in sequence)
    val stacked = cols.map(c =>
      s"'$c', ${c}_nulls, ${c}_min, ${c}_max, ${c}_mean")
      .mkString(", ")
    one.select(col("n_rows"), expr(
      s"stack(${cols.size}, $stacked) AS (col_name, n_nulls, min_val, max_val, mean_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_val"), col("max_val"), col("mean_val"))
      .orderBy(col("col_name"))
  }

  /** The opt-in cardinality audit split out of [[columnProfile]]:
    * documented-EXACT distinct counts (this query deliberately buys the
    * Expand-replicated scan — it is the audit, not the routine profile)
    * plus the DataSketches HLL sketch each exact count validates, emitted
    * as within-5% flags the oracle pins to 1 (the
    * [[Relational.approxDistinct]] pattern). At 100 TB the profile runs
    * always, this runs on demand — and the flags are the evidence the
    * sketch is a safe substitute when even this query gets too expensive.
    */
  def profileDistinct(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // The exact and approx halves MUST be separate aggregates: Catalyst
    // rewrites multi-distinct as Expand → partial agg keyed on
    // (gid, value), and any non-distinct aggregate in the same plan is
    // carried in EVERY (gid, value) group's buffer. With four rsd=0.01
    // HLL++ sketches (~16 KB each) that is ~64 KB of buffer per distinct
    // value — measured 5.8 s at sf0.001 fused vs 0.5 s split. Each half
    // is a 1-row aggregate; the crossJoin is a broadcast of one row.
    // Sketch of choice: hll_sketch_agg (Apache DataSketches), NOT
    // approx_count_distinct. The built-in HLL++ is a plain
    // ImperativeAggregate whose buffer is one attribute per register
    // word, and in a grouping-less HashAggregate every input row pays a
    // cost proportional to that buffer — measured 3.3 s warm at sf0.001
    // for four rsd=0.01 sketches vs 0.2 s for four lgK=14 DataSketches
    // (object buffer, true O(1) update; same ~0.8% standard error). The
    // string cast is required by hll_sketch_agg's input contract and is
    // distinct-preserving for these positive decimals.
    val fact = Tables.lineitem(s, dir)
    val exact = fact.agg(
      count_distinct(col(cols.head)).as(s"${cols.head}_distinct"),
      cols.tail.map(c => count_distinct(col(c)).as(s"${c}_distinct")): _*)
    val approx = fact.agg(
      hll_sketch_estimate(hll_sketch_agg(col(cols.head).cast("string"), lit(14)))
        .as(s"__a_${cols.head}"),
      cols.tail.map(c =>
        hll_sketch_estimate(hll_sketch_agg(col(c).cast("string"), lit(14)))
          .as(s"__a_$c")): _*)
    val one = exact.crossJoin(broadcast(approx))
    val stacked = cols.map(c =>
      s"'$c', ${c}_distinct, " +
        s"CAST(CAST(abs(__a_$c - ${c}_distinct) AS DOUBLE) <= ${c}_distinct * 0.05 AS BIGINT)")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS (col_name, n_distinct, approx_within_5pct)"))
      .orderBy(col("col_name"))
  }

  /** Two-sample Kolmogorov–Smirnov drift between the pre-1996 and
    * post-1996 order-value distributions: D = max over x of
    * |F_pre(x) − F_post(x)| — the binning-free companion to [[psiDrift]]
    * (PSI's fixed bins can hide a shift that lands inside one bin; the
    * KS statistic sees every distinct value).
    *
    * The interesting part at scale is the CDF itself: a cumulative over
    * ALL distinct values is the textbook single-partition-window
    * anti-pattern. This computes it as a DISTRIBUTED PREFIX SUM:
    * range-repartition the per-value counts, take per-partition totals
    * (one row per partition — the only thing the driver ever sees),
    * prefix them into per-partition offsets, broadcast, and let each
    * partition emit its local running sum plus its offset. Work per
    * partition is |values|/P; driver state is P rows, constant in data
    * size.
    *
    * The ranged per-value table is persisted (memory-and-disk) BEFORE
    * the totals pass: the offset map is keyed by partition id, so the
    * cum pass must see the identical partitioning — a re-computed
    * RangePartitioner can resample different boundaries. Persisting pins
    * it (on a cluster this would be a durable checkpoint, the
    * [[DedupClusters.connectedComponents]] `checkpointDir` argument
    * pattern).
    *
    * Determinism: counts are exact longs end-to-end; the only doubles
    * are the two terminal divisions and the max — IEEE-identical in any
    * engine, order-independent for max.
    */
  def ksDistance(a: DataFrame, b: DataFrame, valCol: String,
                 parts: Int = 32): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val tagged = a.select(col(valCol).cast("double").as("v"))
      .withColumn("ca", lit(1L)).withColumn("cb", lit(0L))
      .unionByName(b.select(col(valCol).cast("double").as("v"))
        .withColumn("ca", lit(0L)).withColumn("cb", lit(1L)))
    val byVal = tagged.groupBy(col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val ranged = byVal.repartitionByRange(parts, col("v"))
      .sortWithinPartitions(col("v"))
      .select(col("v"), col("ca"), col("cb"))
      .as[(Double, Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var sa = 0L; var sb = 0L
      it.foreach { t => sa += t._2; sb += t._3 }
      Iterator.single((pid, sa, sb))
    }.collect().sortBy(_._1)
    val offsets = {
      var ca = 0L; var cb = 0L
      totals.map { case (pid, sa, sb) =>
        val r = pid -> (ca, cb); ca += sa; cb += sb; r
      }.toMap
    }
    val n1 = totals.map(_._2).sum.toDouble
    val n2 = totals.map(_._3).sum.toDouble
    val bc = spark.sparkContext.broadcast(offsets)
    val cum = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var (ca, cb) = bc.value.getOrElse(pid, (0L, 0L))
      it.map { case (v, da, db) => ca += da; cb += db; (v, ca, cb) }
    }.toDF("v", "ca_cum", "cb_cum")
    // `ranged` stays persisted until the session drops it: the returned
    // plan is lazy, and unpersisting before the caller's action would
    // let the cum pass recompute the range partitioning — and the
    // broadcast offsets are only valid for the partitioning the totals
    // pass saw.
    cum
      .select(col("v"),
        abs(col("ca_cum").cast("double") / n1 -
            col("cb_cum").cast("double") / n2).as("d"))
      .orderBy(col("d").desc, col("v")).limit(1)
      .select(lit(n1.toLong).as("n_pre"), lit(n2.toLong).as("n_post"),
        round(col("d"), 6).as("ks_stat"), col("v").as("ks_at"))
  }

  def ksDrift(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val cut = lit("1996-01-01")
    ksDistance(orders.filter(col("o_orderdate") < cut),
      orders.filter(col("o_orderdate") >= cut), "o_totalprice")
  }

  /** Population stability index between the pre-1999 and post-1999 order
    * value distributions over 6 fixed-width bins:
    * PSI = Σ (p−q)·ln(p/q), proportions floored at 1e-6 (the standard
    * zero-bin guard) — literals spelled identically in both engines, ln
    * drift absorbed by the terminal round-6. Two filtered one-row
    * aggregates; the bin histogram is a conditional-sum stack, so the
    * whole monitor is ONE scan of the fact table.
    */
  private val PsiBins = 6
  private val PsiWidth = 100000.0

  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val base = col("o_orderdate") < lit("1999-01-01")
    def inBin(b: Int) =
      col("o_totalprice") >= b * PsiWidth &&
        (col("o_totalprice") < (b + 1) * PsiWidth || lit(b == PsiBins - 1))
    val aggs =
      Seq(sum(when(base, 1L).otherwise(0L)).as("n_base"),
        sum(when(!base, 1L).otherwise(0L)).as("n_curr")) ++
        (0 until PsiBins).map(b =>
          sum(when(base && inBin(b), 1L).otherwise(0L)).as(s"pb$b")) ++
        (0 until PsiBins).map(b =>
          sum(when(!base && inBin(b), 1L).otherwise(0L)).as(s"qb$b"))
    val one = Tables.orders(s, dir).agg(aggs.head, aggs.tail: _*)
    val psi = (0 until PsiBins).map { b =>
      val p = greatest(col(s"pb$b").cast("double") / col("n_base"), lit(0.000001))
      val q = greatest(col(s"qb$b").cast("double") / col("n_curr"), lit(0.000001))
      (p - q) * log(p / q)
    }.reduce(_ + _)
    one.select(col("n_base"), col("n_curr"), round(psi, 6).as("psi"))
  }

  /** Weekly cohort retention: users bucketed by first-seen week, counted
    * per (cohort week, active week). Per-user first week is a grouped min
    * (shuffle on user_id); the join back is co-partitioned on the same
    * key; the matrix aggregate is a few dozen cells.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(s, dir)
      .select(col("user_id"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
    val firstWeek = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.distinct()
      .join(firstWeek, "user_id")
      .groupBy(col("cohort_week"), col("week").as("active_week"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("active_week"))
  }

  /** Data-contract validation — the admission gate a pipeline runs before
    * trusting a new drop: referential integrity (left-anti counts on the
    * join keys), domain ranges, and enum membership, one row per rule so
    * a single non-zero cell names the broken contract. The FK probes are
    * key-only anti-joins (column-pruned scans, co-partitioned shuffles);
    * the range/enum rules fold into per-table single-scan conditional
    * aggregates.
    */
  def contractChecks(s: SparkSession, dir: String): DataFrame =
    contractChecksOn(Tables.orders(s, dir), Tables.lineitem(s, dir),
      Tables.customer(s, dir))

  private[graft] def contractChecksOn(orders: DataFrame, li: DataFrame,
                                      customer: DataFrame): DataFrame = {
    def oneRow(rule: String, d: DataFrame) =
      d.select(lit(rule).as("rule"), col("n"))
    val orphanOrders = oneRow("fk_orders_custkey",
      orders.select(col("o_custkey"))
        .join(customer.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")))
    val orphanLines = oneRow("fk_lineitem_orderkey",
      li.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n")))
    val orderRules = orders.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("neg_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"))
    val lineRules = li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .agg(
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("bad_discount"),
        sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
          .as("ship_before_order"))
    orphanOrders
      .unionByName(orphanLines)
      .unionByName(oneRow("range_totalprice_positive",
        orderRules.select(col("neg_price").as("n"))))
      .unionByName(oneRow("enum_orderstatus",
        orderRules.select(col("bad_status").as("n"))))
      .unionByName(oneRow("range_discount_unit",
        lineRules.select(col("bad_discount").as("n"))))
      .unionByName(oneRow("order_ship_after_order",
        lineRules.select(col("ship_before_order").as("n"))))
      .select(col("rule"), col("n").as("n_violations"))
      .orderBy(col("rule"))
  }

  /** Differentially-private count release (Laplace mechanism, ε = 1,
    * sensitivity 1 for counts) with CONSISTENT noise: the Laplace draw is
    * derived from md5 of a fixed seed string + the group key (inverse
    * CDF over the md5-uniform), so re-running the release returns the
    * SAME noisy values — the standard defence against averaging-away the
    * noise over repeated queries. The privacy guarantee is that of a
    * seeded-PRNG DP release: it holds against consumers of the output,
    * not against an adversary who holds the seed — which is the contract
    * every production DP system with reproducible releases documents.
    * Because THIS demo's seed is a source-visible string ("dp1:"), the
    * emitted budget column is named `nominal_epsilon`: it records the
    * mechanism's parameter, not an achieved guarantee against a reader of
    * this repository. A real deployment must draw the seed from a secret
    * store; only then does nominal become effective.
    * Extends the reference's privacy posture (federated scatter-gather,
    * similarity_search.py:322-363) with the aggregate-release layer.
    * Shape: one grouped count + per-group scalar math; noise math is the
    * [[graft.operators.TextAnalysis.hashSample]] md5-parity recipe, so
    * DuckDB reproduces the release bit-for-bit.
    */
  def dpCounts(s: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(
      concat(lit("dp1:"), col("n_name")).cast("binary")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val noise = signum(lit(0.5) - u) * log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("true_n"))
      .select(col("n_name"),
        round(col("true_n") + noise, 6).as("dp_count"),
        lit(1.0).as("nominal_epsilon"))
      .orderBy(col("n_name"))
  }

  /** k-anonymity audit over a quasi-identifier projection (the release
    * gate that pairs with [[dpCounts]]): equivalence-class sizes for
    * (nation, segment, balance-band), the achieved k (min class size),
    * and how many rows a release at the given k would have to suppress.
    * Output column names carry the k they were computed at
    * (`rows_suppressed_at_k<k>`), so a non-default k can't masquerade as
    * the default. One grouped count + a 1-row rollup — the audit never
    * materializes the classes.
    */
  def kAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("class_size"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_achieved"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as(s"rows_suppressed_at_k$k"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as(s"classes_below_k$k"))

  /** Deterministic pseudonymization (the GDPR-article-4(5) masking op):
    * replace direct identifiers with md5-derived tokens so datasets stay
    * JOINABLE — the same key always maps to the same token, across tables
    * and runs — while names never leave the engine. The query proves both
    * properties the op is used for: token↔name bijectivity per nation
    * (distinct-token count == distinct-name count) and join preservation
    * (order counts joined THROUGH the pseudonymous key equal the
    * plain-key counts the oracle computes). Same caveat as [[dpCounts]]:
    * with a source-visible salt this is pseudonymization (reversible by
    * whoever holds the salt + a name list), not anonymization — the k
    * side of that story is [[kAnonymity]].
    */
  def pseudonymize(s: SparkSession, dir: String): DataFrame = {
    def tok(c: org.apache.spark.sql.Column) =
      substring(md5(concat(lit("pseud1:"), c.cast("string")).cast("binary")), 1, 16)
    val cust = Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_name"),
        tok(col("c_name")).as("name_token"), tok(col("c_custkey")).as("key_token"))
    val ord = Tables.orders(s, dir)
      .select(tok(col("o_custkey")).as("o_key_token"))
    cust.join(ord, col("key_token") === col("o_key_token"), "left")
      .groupBy(col("c_nationkey"))
      .agg(
        count_distinct(col("c_name")).as("n_names"),
        count_distinct(col("name_token")).as("n_name_tokens"),
        sum(when(col("o_key_token").isNotNull, 1L).otherwise(0L))
          .as("n_orders_via_token"))
      .orderBy(col("c_nationkey"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_profile"   -> (columnProfile _),
    "q_profile_distinct" -> (profileDistinct _),
    "q_psi_drift" -> (psiDrift _),
    "q_ks_drift" -> (ksDrift _),
    "q_cohort"    -> (cohortRetention _),
    "q_contract_checks" -> (contractChecks _),
    "q_dp_counts" -> (dpCounts _),
    "q_k_anonymity" -> ((s, d) => kAnonymity(s, d)),
    "q_pseudonymize" -> (pseudonymize _))

  override def oracleSql: Map[String, String] = Map(
    "q_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(min($c) AS DOUBLE) AS min_val,
           |  CAST(max($c) AS DOUBLE) AS max_val,
           |  round(avg($c), 6) AS mean_val
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_profile_distinct" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(1 AS BIGINT) AS approx_within_5pct
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    // the oracle's cumulative is a plain window (fine at oracle SF);
    // the engine's is the distributed prefix sum — same exact counts
    "q_ks_drift" ->
      """WITH tagged AS (
        |  SELECT o_totalprice AS v,
        |    CASE WHEN o_orderdate < '1996-01-01' THEN 1 ELSE 0 END AS ca,
        |    CASE WHEN o_orderdate < '1996-01-01' THEN 0 ELSE 1 END AS cb
        |  FROM orders
        |), byval AS (
        |  SELECT v, sum(ca) AS ca, sum(cb) AS cb FROM tagged GROUP BY v
        |), n AS (
        |  SELECT CAST(sum(ca) AS DOUBLE) AS n1, CAST(sum(cb) AS DOUBLE) AS n2
        |  FROM byval
        |), cum AS (
        |  SELECT v, sum(ca) OVER (ORDER BY v) AS cca,
        |    sum(cb) OVER (ORDER BY v) AS ccb
        |  FROM byval
        |), d AS (
        |  SELECT v, abs(CAST(cca AS DOUBLE) / n1 - CAST(ccb AS DOUBLE) / n2) AS d
        |  FROM cum CROSS JOIN n
        |)
        |SELECT CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
        |  round(d, 6) AS ks_stat, v AS ks_at
        |FROM d CROSS JOIN n ORDER BY d DESC, v LIMIT 1""".stripMargin,
    "q_psi_drift" -> {
      def cnt(pred: String, b: Int): String = {
        val lo = b * PsiWidth
        val upper =
          if (b == PsiBins - 1) "TRUE"
          else s"o_totalprice < ${(b + 1) * PsiWidth}"
        s"CAST(sum(CASE WHEN $pred AND o_totalprice >= $lo AND ($upper) THEN 1 ELSE 0 END) AS BIGINT)"
      }
      val isBase = "o_orderdate < TIMESTAMP '1999-01-01'"
      val isCurr = "o_orderdate >= TIMESTAMP '1999-01-01'"
      val binCols =
        (0 until PsiBins).map(b => s"${cnt(isBase, b)} AS pb$b") ++
          (0 until PsiBins).map(b => s"${cnt(isCurr, b)} AS qb$b")
      val terms = (0 until PsiBins).map { b =>
        val p = s"greatest(CAST(pb$b AS DOUBLE) / n_base, 0.000001)"
        val q = s"greatest(CAST(qb$b AS DOUBLE) / n_curr, 0.000001)"
        s"(($p) - ($q)) * ln(($p) / ($q))"
      }.mkString(" + ")
      s"""SELECT n_base, n_curr, round($terms, 6) AS psi FROM (
         |  SELECT
         |    CAST(sum(CASE WHEN $isBase THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         |    CAST(sum(CASE WHEN $isCurr THEN 1 ELSE 0 END) AS BIGINT) AS n_curr,
         |    ${binCols.mkString(",\n    ")}
         |  FROM orders)""".stripMargin
    },
    "q_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
        |    count(*) AS class_size
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_classes,
        |  CAST(min(class_size) AS BIGINT) AS k_achieved,
        |  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
        |    AS BIGINT) AS rows_suppressed_at_k5,
        |  CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_below_k5
        |FROM cls""".stripMargin,
    "q_pseudonymize" ->
      """SELECT c_nationkey,
        |  CAST(count(DISTINCT c_name) AS BIGINT) AS n_names,
        |  CAST(count(DISTINCT substring(md5('pseud1:' || c_name), 1, 16))
        |    AS BIGINT) AS n_name_tokens,
        |  CAST(coalesce(sum(o.n), 0) AS BIGINT) AS n_orders_via_token
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
        |  ON o.o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_dp_counts" ->
      """WITH g AS (
        |  SELECT n_name, count(*) AS true_n
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |u AS (
        |  SELECT n_name, true_n,
        |    (CAST(('0x' || substring(md5('dp1:' || n_name), 1, 8)) AS BIGINT)
        |      + 0.5) / 4294967296.0 AS uu
        |  FROM g)
        |SELECT n_name,
        |  round(true_n + sign(0.5 - uu) * ln(1.0 - 2.0 * abs(uu - 0.5)), 6)
        |    AS dp_count,
        |  CAST(1.0 AS DOUBLE) AS nominal_epsilon
        |FROM u ORDER BY n_name""".stripMargin,
    "q_contract_checks" ->
      """SELECT rule, n AS n_violations FROM (
        |  SELECT 'fk_orders_custkey' AS rule, count(*) AS n FROM orders
        |   WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orderkey', count(*) FROM lineitem
        |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'range_totalprice_positive',
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'enum_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'range_discount_unit',
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'order_ship_after_order',
        |    CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |ORDER BY rule""".stripMargin,
    "q_cohort" ->
      """WITH w AS (
        |  SELECT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
        |  FROM events),
        |fw AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
        |SELECT f.cohort_week, d.week AS active_week, count(*) AS n_users
        |FROM (SELECT DISTINCT user_id, week FROM w) d
        |JOIN fw f ON f.user_id = d.user_id
        |GROUP BY f.cohort_week, d.week
        |ORDER BY f.cohort_week, active_week""".stripMargin)
}
