package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-inventory plan audit (guide §1.2/§7.2): executes every declared
  * query once at the given SF and emits ONE TSV line per query with the
  * plan-shape facts regression reviews care about — Exchange count, join
  * strategies, TakeOrderedAndProject, scan pushdown, codegen presence,
  * and the scale-killer flags (CartesianProduct / BroadcastNestedLoopJoin
  * on a non-trivial side, per-row Scala UDF nodes in the hot path).
  *
  * Usage: runMain graft.tools.PlanAuditAll [sfDir] [outFile]
  */
object PlanAuditAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.drop(1).headOption.getOrElse("plans/r13/AUDIT.tsv")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("query\texchanges\tjoins\ttakeOrdered\tpushedFilters\t" +
      "codegen\tflags\n")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val line = try {
        spark.sparkContext.setJobDescription(s"audit: $name")
        val df = fn(spark, sfDir)
        df.collect()
        val qe = df.queryExecution
        val plan = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val executed = qe.executedPlan.toString
        def count(s: String, n: String) = s.sliding(n.length).count(_ == n)
        val ex = count(plan, "Exchange")
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => j -> count(plan, j)).filter(_._2 > 0)
          .map { case (j, c) => s"$j:$c" }.mkString(",")
        val topk = count(plan + executed, "TakeOrderedAndProject") > 0
        val pushed = plan.contains("PushedFilters: [I") ||
          plan.contains("PushedFilters: [E") ||
          plan.contains("PushedFilters: [G") ||
          plan.contains("PushedFilters: [L") ||
          plan.contains("PushedFilters: [O") ||
          plan.contains("PushedFilters: [N")
        val codegen = executed.contains("*(")
        val flags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (plan.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None,
          if (executed.contains("BatchEvalPython")) Some("PYUDF") else None
        ).flatten.mkString(",")
        s"$name\t$ex\t${if (joins.isEmpty) "-" else joins}\t$topk\t" +
          s"$pushed\t$codegen\t${if (flags.isEmpty) "-" else flags}"
      } catch {
        case e: Throwable =>
          s"$name\tERR\t${e.getClass.getSimpleName}\t-\t-\t-\t-"
      } finally spark.sparkContext.setJobDescription(null)
      sb.append(line).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $outFile")
    spark.stop()
  }
}
