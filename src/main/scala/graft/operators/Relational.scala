package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Relational operator inventory over the TPC-H-ish corpus — the `[EXT]`
  * coverage SURVEY.md §2.3/§2.4 notes Catalyst provides for free, declared
  * here as oracle-checked queries so the capability is demonstrated, not
  * assumed.
  *
  * Numeric policy (oracle parity): money math in DECIMAL(18,2) — exact,
  * associative, immune to double summation-order drift across engines —
  * then a single terminal cast to DOUBLE so Spark and DuckDB emit identical
  * bits and identical arrow schemas.
  */
object Relational extends QueryPack {

  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** TPC-H Q1-shaped pricing summary: hash-agg with partial (map-side)
    * aggregation; scan reads only the 7 referenced columns.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2002-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped: 3-way join (customer ⨝ orders ⨝ lineitem) + agg +
    * top-k. customer is broadcast (small dim); orders⨝lineitem shuffles on
    * the order key — at 100 TB this is the natural co-partitioned join; AQE
    * handles skew.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir)
    val li   = Tables.lineitem(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
               (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
             .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Broadcast-join chain over the tiny dims + grouped agg. */
  def regionNationRollup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("customers"),
        decSum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("r_name"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q1_pricing_summary"  -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q_region_rollup"     -> (regionNationRollup _))

  override def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        | FROM lineitem
        | WHERE l_shipdate <= TIMESTAMP '2002-09-01 00:00:00'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE c_mktsegment = 'BUILDING'
        | GROUP BY l_orderkey
        | ORDER BY revenue DESC, l_orderkey
        | LIMIT 10""".stripMargin,
    "q_region_rollup" ->
      """SELECT r_name, count(*) AS customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        | FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name
        | ORDER BY r_name""".stripMargin)
}
