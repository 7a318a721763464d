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
  * independence and merge associativity. Non-mergeable aggregates
  * (exact distinct, exact median) are deliberately NOT in the state
  * schema — they need sketches (HLL, KLL) and their own error story.
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

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_incr_agg" -> (incrementalView _))

  override def oracleSql: Map[String, String] = Map(
    "q_incr_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) AS avg_price,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
