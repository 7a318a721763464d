package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** LATERAL correlated top-k: semantics equal a window-rank recompute,
  * and the physical plan is the decorrelated one-shuffle shape (a
  * WindowGroupLimit, no per-row nested-loop re-scan of orders).
  */
class LateralJoinSpec extends SparkSpec {

  test("lateral top-3 equals a window-rank recompute") {
    val got = Relational.lateralTopOrders(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .join(Tables.customer(spark, sfDir)
          .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") % 10 === 0),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double"))
      .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("plan decorrelates to a group-limited window, not a nested loop") {
    val plan = Relational.lateralTopOrders(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }
}
