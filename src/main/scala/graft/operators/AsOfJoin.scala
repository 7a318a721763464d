package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Backward as-of join — the canonical "operator Spark lacks" (time-series
  * point-in-time lookup: for each left row, the single right row with the
  * greatest right-time ≤ left-time in the same key group).
  *
  * Built by COMPOSITION (preference order (a), no custom SparkPlan
  * needed): range-join + per-left-row `row_number` window. The join is an
  * equi-join on the key with the time bound as a post-filter, so Catalyst
  * shuffles both sides once on the key; the window then runs within the
  * same partitioning (no second exchange — key ⊂ window partition).
  *
  * Scale: per-key right-side cardinality bounds the intermediate blow-up.
  * For unbounded right sides (e.g. tick data), the union-tag trick — union
  * both sides, one window pass carrying `last(right-cols, ignoreNulls)`
  * over (key ORDER BY time) — does it in a single sort with no join at
  * all; this composition keeps the simpler plan since our per-key groups
  * are small.
  */
object AsOfJoin extends QueryPack {

  /** For each left row (identified by unique `leftId`), attach the right
    * row with the greatest `rightTime` ≤ `leftTime` for the same `on` key,
    * ties broken by `tiebreak` descending. Left rows with no match drop
    * (inner as-of; wrap with a left join of results for the outer form).
    */
  def asofBackward(left: DataFrame, right: DataFrame, on: (Column, Column),
                   leftTime: Column, rightTime: Column,
                   leftId: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(leftId)
      .orderBy(rightTime.desc, tiebreak.desc)
    left.join(right, on._1 === on._2 && rightTime <= leftTime)
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Left-outer backward as-of: like [[asofBackward]] but left rows with
    * no right row at-or-before their time are KEPT with null right
    * columns (DuckDB `ASOF LEFT JOIN` semantics). The left outer join
    * emits exactly one all-null right row for an unmatched left id, so
    * the same rn=1 window picks either the latest match or that null row
    * — one shuffle on the key, one window, no second pass.
    */
  def asofBackwardOuter(left: DataFrame, right: DataFrame, on: (Column, Column),
                        leftTime: Column, rightTime: Column,
                        leftId: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(leftId)
      .orderBy(rightTime.desc, tiebreak.desc)
    left.join(right, on._1 === on._2 && rightTime <= leftTime, "left")
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Single-pass as-of variant for UNBOUNDED right sides: union-tag both
    * inputs, one window sorted by (key, time) carrying
    * `last(right-cols, ignoreNulls)` forward — no join, one sort, state
    * O(1) per key. Equivalent semantics to [[asofBackward]] when right
    * times are unique per key after tiebreak ordering (the window's sort
    * puts the tiebreak-greatest right row last among equal times, which
    * `last()` then carries — matching asofBackward's tiebreak-desc pick).
    */
  def asofBackwardSinglePass(left: DataFrame, right: DataFrame,
                             leftKey: String, rightKey: String,
                             leftTime: Column, rightTime: Column,
                             rightCols: Seq[String], tiebreak: Column): DataFrame = {
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", leftTime)
      .withColumn("__is_left", lit(1)).withColumn("__tb", lit(Long.MaxValue))
    val lAligned = rightCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__r_$c", lit(null)))
    val r = right
      .withColumn("__k", col(rightKey)).withColumn("__t", rightTime)
      .withColumn("__is_left", lit(0)).withColumn("__tb", tiebreak.cast("long"))
    val rAligned = rightCols.foldLeft(r)((df, c) =>
      df.withColumn(s"__r_$c", col(c)))

    val unioned = lAligned.select(
      (left.columns.toSeq.map(col) :+ col("__k") :+ col("__t") :+ col("__is_left")
        :+ col("__tb")) ++ rightCols.map(c => col(s"__r_$c")): _*)
      .unionByName(rAligned.select(
        (left.schema.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name))
          :+ col("__k") :+ col("__t") :+ col("__is_left") :+ col("__tb")) ++
          rightCols.map(c => col(s"__r_$c")): _*))

    // right rows sort before left rows at the same instant (__is_left asc)
    // so a left row sees a same-timestamp right row; among equal right
    // times the greatest tiebreak sorts last and wins last()
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_left"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))

    carried.filter(col("__is_left") === 1)
      .filter(rightCols.map(c => col(s"__r_$c").isNotNull).reduce(_ && _))
      .select(left.columns.toSeq.map(col) ++
        rightCols.map(c => col(s"__r_$c").as(c)): _*)
  }

  /** Driver-contract query: each event joined to the user's most recent
    * order at event time (user_id ≡ o_custkey in the corpus domain).
    */
  def eventsAsofOrders(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir).filter(col("user_id") < 50)
    val orders = Tables.orders(s, dir)
    asofBackward(
      events, orders,
      on = (col("user_id"), col("o_custkey")),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      leftId = col("event_id"), tiebreak = col("o_orderkey"))
      .select(
        col("event_id"), col("user_id"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        datediff(col("ts").cast("date"), col("o_orderdate").cast("date"))
          .as("days_since"))
      .orderBy(col("event_id"))
  }

  /** Left-outer driver-contract query: every event keeps a row; users
    * with no RECENT order (right side restricted to o_orderdate ≥
    * 2000-06-01 — in this corpus every user has *some* ancient order, so
    * an unrestricted right side never leaves a row unmatched) carry null
    * order columns. ~20-30 % of rows are unmatched at every SF, so the
    * outer semantics are genuinely exercised by the oracle.
    */
  def eventsAsofOrdersOuter(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir).filter(col("user_id") < 50)
    val orders = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-06-01"))
    asofBackwardOuter(
      events, orders,
      on = (col("user_id"), col("o_custkey")),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      leftId = col("event_id"), tiebreak = col("o_orderkey"))
      .select(
        col("event_id"), col("user_id"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        datediff(col("ts").cast("date"), col("o_orderdate").cast("date"))
          .as("days_since"))
      .orderBy(col("event_id"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_asof_join" -> (eventsAsofOrders _),
    "q_asof_left" -> (eventsAsofOrdersOuter _))

  override def oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT event_id, user_id, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(date_diff('day', o_orderdate::DATE, ts::DATE) AS INT) AS days_since
        | FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |   row_number() OVER (PARTITION BY e.event_id
        |     ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  WHERE e.user_id < 50)
        | WHERE rn = 1
        | ORDER BY event_id""".stripMargin,
    "q_asof_left" ->
      """SELECT event_id, user_id, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(date_diff('day', o_orderdate::DATE, ts::DATE) AS INT) AS days_since
        | FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |   row_number() OVER (PARTITION BY e.event_id
        |     ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= DATE '2000-06-01') o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  WHERE e.user_id < 50)
        | WHERE rn = 1
        | ORDER BY event_id""".stripMargin)
}
