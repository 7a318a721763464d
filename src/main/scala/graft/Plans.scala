package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints `explain("formatted")` for selected queries
  * plus a compact property check (pushdown reached the scan, top-k planned
  * as TakeOrderedAndProject, dim joins broadcast, codegen spans present).
  * Usage: runMain graft.Plans [sfDir] [queryName...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "q_knn_brute",
        "q_scatter_gather", "q_semi_join", "q_dedup_exact",
        "q_rank_topk_part", "q_snapshot_meta_sum", "q_join_order")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // materialize THIS df's own plan: count() would build a different
      // query (its own agg) and leave this one's AQE plan non-final with
      // no codegen annotations — collect() finalizes the plan we audit
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      println(s"\n======== $name ========")
      println(plan)
      def has(p: String, s: String) = if (p.contains(s)) "yes" else "NO"
      // codegen spans appear as "*(n)" markers in the executed simple string
      println(s"[audit] $name: PushedFilters=${has(plan, "PushedFilters: [")} " +
        s"WholeStageCodegen=${has(executed, "*(")} " +
        s"TakeOrdered=${has(plan + executed, "TakeOrderedAndProject")} " +
        s"BroadcastHashJoin=${has(plan + executed, "BroadcastHashJoin")} " +
        s"Exchanges=${plan.sliding("Exchange".length).count(_ == "Exchange")}")
    }
    spark.stop()
  }
}
