package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ProfilingSpec extends SparkSpec {

  test("profile invariants: bounds ordered, no nulls here; plan has no Expand") {
    val df = Profiling.columnProfile(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    for (r <- rows) {
      assert(r.getLong(2) === 0L, s"nulls in ${r.getString(0)}")
      assert(r.getDouble(3) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(4),
        s"min <= mean <= max for ${r.getString(0)}")
    }
    // the routine profile must stay a single-scan aggregate — the exact
    // distinct counts moved to profileDistinct precisely to keep the
    // Expand-replicated scan out of this plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile must not Expand:\n$plan")
  }

  test("profileDistinct: exact counts bounded by rows; sketch within 5%") {
    val rows = Profiling.profileDistinct(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    val nRows = graft.Tables.lineitem(spark, sfDir).count()
    for (r <- rows) {
      assert(r.getLong(1) > 0 && r.getLong(1) <= nRows)
      assert(r.getLong(2) === 1L,
        s"approx_count_distinct drifted >5% for ${r.getString(0)}")
    }
  }

  test("psi is non-negative (each term has matching signs) and counts reconcile") {
    val r = Profiling.psiDrift(spark, sfDir).collect().head
    assert(r.getDouble(2) >= 0.0)
    assert(r.getLong(0) + r.getLong(1) ===
      graft.Tables.orders(spark, sfDir).count())
  }

  test("contract checks: clean corpus reports zero violations; injected " +
    "breaks surface with exact counts") {
    val report = Profiling.contractChecks(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.size === 6)
    // the corpus satisfies the FK/range/enum contracts…
    for (rule <- Seq("fk_orders_custkey", "fk_lineitem_orderkey",
      "range_totalprice_positive", "enum_orderstatus", "range_discount_unit"))
      assert(report(rule) === 0L, rule)
    // …but genuinely CONTAINS early-ship rows — the report must find
    // them all (independent recompute), not assume cleanliness
    import org.apache.spark.sql.functions.col
    val earlyShips = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).count()
    assert(earlyShips > 0, "corpus is known to contain early ships")
    assert(report("order_ship_after_order") === earlyShips)

    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val early = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val customers = Seq(Tuple1(1L)).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "O", 100.0, ts),   // clean
      (11L, 9L, "X", -5.0, ts))    // orphan custkey + bad status + bad price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val lines = Seq(
      (10L, 0.1, ts),              // clean
      (10L, 1.5, early),           // bad discount + ships before order
      (99L, 0.2, ts))              // orphan orderkey
      .toDF("l_orderkey", "l_discount", "l_shipdate")
    val got = Profiling.contractChecksOn(orders, lines, customers).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "fk_orders_custkey" -> 1L,
      "fk_lineitem_orderkey" -> 1L,
      "range_totalprice_positive" -> 1L,
      "enum_orderstatus" -> 1L,
      "range_discount_unit" -> 1L,
      "order_ship_after_order" -> 1L))
  }

  test("dp release: noise matches a scalar Laplace recompute, is bounded, " +
    "and re-running returns the identical release") {
    import org.apache.spark.sql.functions.col
    val truth = graft.Tables.customer(spark, sfDir)
      .join(graft.Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def release() = Profiling.dpCounts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val rel = release()
    assert(rel.keySet === truth.keySet)
    for ((name, dp) <- rel) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp1:$name".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.take(8), 16) + 0.5) / 4294967296.0
      val noise = math.signum(0.5 - u) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val want = BigDecimal(truth(name) + noise)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(dp === want, s"nation $name")
      // |noise| <= -ln(2^-32) ~ 22.2 by construction of the md5-uniform
      assert(math.abs(dp - truth(name)) < 23.0)
    }
    assert(release() === rel, "consistent-noise release must be reproducible")
  }

  test("k-anonymity audit matches a scalar recompute of the class sizes") {
    val classes = graft.Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1),
        math.floor(r.getAs[Number](2).doubleValue() / 2000).toLong))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = Profiling.kAnonymity(spark, sfDir).collect().head
    assert(r.getLong(0) === classes.size.toLong)
    assert(r.getLong(1) === classes.values.min)
    assert(r.getLong(2) === classes.values.filter(_ < 5).sum)
    assert(r.getLong(3) === classes.values.count(_ < 5).toLong)
  }

  test("pseudonymization is bijective on names and preserves join counts") {
    val rows = Profiling.pseudonymize(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"token/name distinct counts differ in nation ${r.get(0)}")
    }
    val viaToken = rows.map(_.getLong(3)).sum
    val direct = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.customer(spark, sfDir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .count()
    assert(viaToken === direct)
  }

  test("k-anonymity column names and thresholds follow the requested k") {
    val df = Profiling.kAnonymity(spark, sfDir, k = 3)
    assert(df.columns.toSeq ===
      Seq("n_classes", "k_achieved", "rows_suppressed_at_k3", "classes_below_k3"))
    val classes = graft.Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1),
        math.floor(r.getAs[Number](2).doubleValue() / 2000).toLong))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = df.collect().head
    assert(r.getLong(2) === classes.values.filter(_ < 3).sum)
    assert(r.getLong(3) === classes.values.count(_ < 3).toLong)
  }

  test("every user is active in their own cohort week (diagonal covers all users)") {
    val m = Profiling.cohortRetention(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val diag = m.filter(x => x._1 == x._2).map(_._3).sum
    val users = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(diag === users)
    // no cell precedes its cohort week
    assert(m.forall(x => x._2 >= x._1))
  }

  test("distributed-prefix-sum KS equals the single-window recompute, " +
    "for any partition count") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sfDir)
    val cut = lit("1996-01-01")
    val (a, b) = (orders.filter(col("o_orderdate") < cut),
      orders.filter(col("o_orderdate") >= cut))
    // naive reference: global window cumulative (fine at spec SF)
    val tagged = a.select(col("o_totalprice").as("v")).withColumn("ca", lit(1L))
      .withColumn("cb", lit(0L))
      .unionByName(b.select(col("o_totalprice").as("v"))
        .withColumn("ca", lit(0L)).withColumn("cb", lit(1L)))
    val byVal = tagged.groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val n1 = a.count().toDouble; val n2 = b.count().toDouble
    val w = Window.orderBy(col("v"))
    val expected = byVal
      .withColumn("d", abs(sum(col("ca")).over(w).cast("double") / n1 -
        sum(col("cb")).over(w).cast("double") / n2))
      .orderBy(col("d").desc, col("v")).limit(1)
      .select(round(col("d"), 6), col("v")).collect().head
    for (parts <- Seq(3, 32)) {
      val got = Profiling.ksDistance(a, b, "o_totalprice", parts)
        .collect().head
      assert(got.getLong(0) === n1.toLong && got.getLong(1) === n2.toLong)
      assert(got.getDouble(2) === expected.getDouble(0), s"parts=$parts")
      assert(got.getDouble(3) === expected.getDouble(1), s"parts=$parts")
    }
  }

  test("KS on a hand-built shift: distance and location are exact") {
    import spark.implicits._
    // F_a steps at 1..4 by 1/4; F_b steps at 3..6 by 1/4.
    // Max gap is 1/2, first reached at v=2 (F_a=1/2, F_b=0).
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")
    val r = Profiling.ksDistance(a, b, "x", parts = 2).collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 2.0)
  }
}
