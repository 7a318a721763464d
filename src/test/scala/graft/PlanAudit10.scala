package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 plan audit (cont.): bucketed snapshot tables at sf0.1 —
  * exchange counts and wall time for the fact⋈dim custkey join,
  * bucketed vs plain, with broadcast disabled so the comparison
  * isolates what bucketing removes (the two shuffles + the AQE
  * coalition work downstream of them). Cite in SCALE.md.
  */
object PlanAudit10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = graft.sources.SnapshotTable

    val base = java.nio.file.Files.createTempDirectory("audit10")
    val t1 = base.resolve("orders").toString
    val t2 = base.resolve("customer").toString
    val orders = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    st.create(spark, t1, orders, "o_orderpriority",
      bucketBy = Some(("o_custkey", 16)))
    st.create(spark, t2, customer, "c_mktsegment",
      bucketBy = Some(("c_custkey", 16)))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def shuffles(df: DataFrame): Int = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
      def count(p: SparkPlan): Int = {
        val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec        => Seq(q.plan)
          case r: ReusedExchangeExec    => Seq(r.child)
          case other                    => other.children
        }
        self + kids.map(count).sum
      }
      count(df.queryExecution.executedPlan)
    }

    def rollup(o: DataFrame, c: DataFrame): DataFrame =
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))

    def time(mk: => DataFrame, label: String): Unit = {
      mk.collect() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val df = mk; df.collect()
        (System.nanoTime() - t0) / 1e9 -> df
      }
      val best = runs.minBy(_._1)
      println(f"JOIN $label%-9s best=${best._1}%6.3f s  " +
        f"shuffles=${shuffles(best._2)}")
    }

    time(rollup(st.read(spark, t1), st.read(spark, t2)), "bucketed")
    time(rollup(orders, customer), "plain")
    spark.stop()
  }
}
