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
        "q_scatter_gather", "q_semi_join", "q_dedup_exact")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n======== $name ========")
      println(plan)
      def has(s: String) = if (plan.contains(s)) "yes" else "NO"
      println(s"[audit] $name: PushedFilters=${has("PushedFilters: [")} " +
        s"WholeStageCodegen=${has("codegen id")} " +
        s"TakeOrdered=${has("TakeOrderedAndProject")} " +
        s"BroadcastHashJoin=${has("BroadcastHashJoin")} " +
        s"Exchanges=${plan.sliding("Exchange".length).count(_ == "Exchange")}")
    }
    spark.stop()
  }
}
