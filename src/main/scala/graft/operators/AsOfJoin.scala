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

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_asof_join" -> (eventsAsofOrders _))

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
        | ORDER BY event_id""".stripMargin)
}
