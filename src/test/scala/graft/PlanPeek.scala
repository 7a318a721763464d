package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan dumper for driver queries (not a spec): runs the
  * named queries at sf0.01 and prints the final AQE plan — the manual
  * audit loop behind the spec-pinned plan shapes. Run:
  * `sbt "Test/runMain graft.PlanPeek q_heavy_hitters ..."`.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    }
    spark.stop()
  }
}
