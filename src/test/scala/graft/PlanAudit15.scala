package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Round-11 plan audit at sf0.1: eager aggregation's measured effect on
  * the rows crossing shuffles. The lineitem⋈orders revenue-by-priority
  * rollup with the rule ON ships partial aggregates (one row per
  * orderkey) through the join shuffle; OFF ships every line item.
  * Numbers cited in SCALE.md. AQE off so executed-plan metrics are the
  * static plan's.
  */
object PlanAudit15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = graft.sources.SnapshotTable

    val base = java.nio.file.Files.createTempDirectory("audit15")
    val fact = base.resolve("fact").toString
    val dim = base.resolve("dim").toString
    // the high-fan-in shape the rule exists for: ~67 events per user
    // (the per-entity fact of a training-data pipeline), joined to a
    // per-user dimension
    st.create(spark, fact, Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value")), "event_type")
    st.create(spark, dim, Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .select(col("user_id").as("u_id"),
        (col("user_id") % 10).cast("string").as("u_region"),
        lit("all").as("u_part")), "u_part")
    graft.plans.EagerAggregation.enableFor(fact)
    graft.plans.EagerAggregation.install(spark)

    def query: DataFrame = st.read(spark, fact)
      .join(st.read(spark, dim), col("user_id") === col("u_id"))
      .groupBy(col("u_region"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"),
        max(col("event_id")).as("max_event"))

    def shuffledRows(df: DataFrame): (Long, Seq[String]) = {
      val rows = df.collect().map(_.toString).toSeq.sorted
      val n = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec =>
          e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      }.sum
      (n, rows)
    }

    val (onRows, onRes) = shuffledRows(query)
    spark.conf.set("spark.graft.eagerAgg", "false")
    val (offRows, offRes) = shuffledRows(query)
    spark.conf.unset("spark.graft.eagerAgg")

    val factRows = st.read(spark, fact).count()
    val keys = st.read(spark, fact).select("user_id").distinct().count()
    println(s"AUDIT15 fact=$factRows rows, keys=$keys")
    println(s"AUDIT15 shuffleRecordsWritten: ruleOn=$onRows ruleOff=$offRows " +
      f"(${offRows.toDouble / onRows}%.2fx reduction)")
    assert(onRes == offRes, "eager aggregation changed the result")
    assert(onRows * 5 < offRows,
      s"expected >=5x shuffle-row reduction, got $onRows vs $offRows")
    println("AUDIT15 OK")
    spark.stop()
  }
}
