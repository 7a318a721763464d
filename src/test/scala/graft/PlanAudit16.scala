package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Round-11 plan audit at sf0.1: the eager-aggregation × stats-broadcast
  * COMPOSITION. The partial aggregate (one row per user) is a tiny
  * build side, but Spark sizes an Aggregate at its child's bytes — only
  * the ANALYZE-backed NDV bound (1500 users × fixed row width ≈ 84 KB)
  * proves it fits a 128 KB threshold that the padded dim and the fact
  * both refuse. ruleOn = static BroadcastHashJoin building the partial
  * aggregate; statsBroadcast off = SortMergeJoin; identical rows.
  * Numbers cited in SCALE.md.
  */
object PlanAudit16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = graft.sources.SnapshotTable

    val base = java.nio.file.Files.createTempDirectory("audit16")
    val fact = base.resolve("fact").toString
    val dim = base.resolve("dim").toString
    st.create(spark, fact, Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value")), "event_type")
    // wide dim whose RETAINED columns (the query consumes every pad)
    // stay over the threshold even after Spark's projection-ratio
    // scaling — so only a genuinely small build side can broadcast
    val pads = (1 to 8).map(i =>
      sha2(concat(lit(i.toString), col("user_id").cast("string")), 512)
        .as(s"pad$i"))
    st.create(spark, dim, Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .select(Seq(col("user_id").as("u_id"),
        (col("user_id") % 10).cast("string").as("u_region")) ++ pads :+
        lit("all").as("u_part"): _*), "u_part")
    graft.plans.EagerAggregation.enableFor(fact)
    graft.plans.EagerAggregation.install(spark)
    graft.plans.StatsBroadcast.install(spark)
    graft.sources.TableStats.analyze(spark, fact, Seq("user_id"), k = 4096)

    val (_, dimBytes, _) = st.tableStats(spark, dim)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "131072")
    println(s"AUDIT16 dimBytes=$dimBytes threshold=131072")

    // the pads ride the GROUPING (dim side keeps its real width through
    // column pruning); the aggregate functions stay fact-only so eager
    // aggregation applies
    def query: DataFrame = st.read(spark, fact)
      .join(st.read(spark, dim), col("user_id") === col("u_id"))
      .groupBy(col("u_region") +: (1 to 8).map(i => col(s"pad$i")): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sv"),
        max(col("event_id")).as("mx"))

    def shape(df: DataFrame): (Int, Int, Seq[String]) = {
      val p = df.queryExecution.sparkPlan
      (p.collect { case b: BroadcastHashJoinExec => b }.size,
        p.collect { case s: SortMergeJoinExec => s }.size,
        df.collect().map(_.toString).toSeq.sorted)
    }

    val (onBhj, onSmj, onRows) = shape(query)
    spark.conf.set("spark.graft.snapshot.statsBroadcast", "false")
    val (offBhj, offSmj, offRows) = shape(query)
    spark.conf.unset("spark.graft.snapshot.statsBroadcast")

    println(s"AUDIT16 ruleOn: bhj=$onBhj smj=$onSmj; " +
      s"statsBroadcastOff: bhj=$offBhj smj=$offSmj")
    assert(onRows == offRows, "composition changed the result")
    assert(onBhj == 1 && onSmj == 0,
      s"expected static BHJ with the NDV bound, got bhj=$onBhj smj=$onSmj")
    assert(offBhj == 0 && offSmj == 1,
      s"expected SMJ without it, got bhj=$offBhj smj=$offSmj")
    println("AUDIT16 OK")
    spark.stop()
  }
}
