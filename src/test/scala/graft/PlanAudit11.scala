package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 plan audit (cont.): the session-4/5 operators at sf0.1 —
  * (a) metadata aggregates plan ZERO files; (b) the dynamic-filter
  * join plans only the dim-relevant files of the fact table; (c) the
  * join-view refresh's legs broadcast the dim sides. Cite in SCALE.md.
  */
object PlanAudit11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = graft.sources.SnapshotTable
    graft.plans.MetadataAggPushdown.install(spark)

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
    def walk[T](df: DataFrame)(f: SparkPlan => Int): Int = {
      df.collect()
      def go(p: SparkPlan): Int = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec        => Seq(q.plan)
          case r: ReusedExchangeExec    => Seq(r.child)
          case other                    => other.children
        }
        f(p) + kids.map(go).sum
      }
      go(df.queryExecution.executedPlan)
    }
    def files(df: DataFrame): Long = {
      var n = 0L
      walk(df) { case s: FileSourceScanExec =>
        n += s.metrics("numFiles").value; 0
        case _ => 0 }
      n
    }
    def shuffles(df: DataFrame): Int =
      walk(df) { case _: ShuffleExchangeLike => 1; case _ => 0 }
    def broadcasts(df: DataFrame): Int =
      walk(df) { case _: BroadcastExchangeLike => 1; case _ => 0 }

    // (a) metadata aggregate: zero files, LocalTableScan only
    val base = java.nio.file.Files.createTempDirectory("audit11")
    val t = base.resolve("orders").toString
    st.create(spark, t, Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
      "o_orderpriority", statsCols = Seq("o_orderkey"))
    val meta = st.read(spark, t).agg(count(lit(1)).as("n"),
      min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
    println(s"[audit11] meta-agg files=${files(meta)} " +
      s"plan=${meta.queryExecution.executedPlan.getClass.getSimpleName}")
    val parts = st.read(spark, t).groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    println(s"[audit11] meta-parts files=${files(parts)}")

    // (b) dynamic-filter join: files planned vs full table
    val full = files(st.read(spark, t))
    import spark.implicits._
    val dimDf = Seq("1-URGENT", "3-MEDIUM").toDF("prio")
    val dj = graft.operators.DynamicFilterJoin.inner(
      st.read(spark, t), "o_orderpriority", broadcast(dimDf), "prio")
    println(s"[audit11] dynjoin files=${files(dj)} of $full full")

    // (c) join-view refresh legs: shuffle/broadcast counts of the
    // delta (the refresh's only data-heavy plan)
    val fact = base.resolve("fact").toString
    val dim = base.resolve("dim").toString
    val orders = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
    st.create(spark, fact, orders.filter(col("o_orderkey") % 5 =!= 0),
      "o_orderpriority")
    st.commitAppend(spark, fact, orders.filter(col("o_orderkey") % 5 === 0),
      "o_orderpriority")
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    st.create(spark, dim, cust, "c_mktsegment")
    val dF = st.readChangesBetween(spark, fact, 1L, 2L)
      .drop("_change_type")
    val dCur = st.read(spark, dim)
    val leg1 = dF.join(dCur, dF("o_custkey") === dCur("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("dn"))
    println(s"[audit11] join-view leg1 shuffles=${shuffles(leg1)} " +
      s"broadcasts=${broadcasts(leg1)} files=${files(leg1)}")

    spark.stop()
  }
}
