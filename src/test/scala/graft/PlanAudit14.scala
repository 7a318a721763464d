package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 plan audit at sf0.1: the INDEX-PRUNED inner join's dim
  * side rides the same manifest-measured sizing as the fact — a
  * filtered SNAPSHOT dim under the (full-table-refusing) threshold
  * plans a STATIC BroadcastHashJoin through innerJoinPruned, with the
  * fact side still the posting-file subset; rule off = SMJ, identical
  * rows. Cite in SCALE.md.
  */
object PlanAudit14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = graft.sources.SnapshotTable
    val six = graft.sources.SecondaryIndex

    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.FileSourceScanExec
    def shape(df: DataFrame): (Int, Int, Long) = {
      val p = df.queryExecution.sparkPlan
      val factFiles = p.collect { case s: FileSourceScanExec =>
        s.relation.location.inputFiles.length.toLong }.max
      (p.collect { case b: BroadcastHashJoinExec => b }.size,
        p.collect { case s: SortMergeJoinExec => s }.size, factFiles)
    }

    val base = java.nio.file.Files.createTempDirectory("audit14")
    val fact = base.resolve("fact").toString
    spark.conf.set("spark.graft.write.targetFileBytes", (1L << 20).toString)
    try st.create(spark, fact, Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority")), "o_orderpriority")
    finally spark.conf.unset("spark.graft.write.targetFileBytes")
    val idx = base.resolve("idx").toString
    six.create(spark, fact, "o_orderkey", idx, buckets = 16)
    val factFilesTotal = st.readManifest(spark, fact,
      st.currentVersion(spark, fact)).size.toLong

    // snapshot DIM: customer keyed by priority slices; filtered to one
    // mktsegment — Spark's Filter sizing sees the FULL dim bytes
    val dimT = base.resolve("dim").toString
    st.create(spark, dimT, Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .filter(col("o_orderkey") % 20 === 0), "o_orderpriority")
    val (_, dimBytes, _) = st.tableStats(spark, dimT)
    // threshold between one priority slice (~1/5) and the full dim:
    // Spark's own sizing refuses, the manifest fold broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (dimBytes / 2).toString)

    // keep the dim's FULL row width in its output: Spark's Project
    // sizing scales by column-width ratio, and the audit must pin the
    // case where Spark's own estimate (full-table bytes) refuses while
    // the manifest fold (one priority slice) broadcasts
    def q() = six.innerJoinPruned(spark, fact, "o_orderkey", idx,
      st.read(spark, dimT).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("d_key"),
          col("o_orderpriority").as("d_pri")),
      "d_key", autoRefresh = false)
      // group by the DIM's carried column: column pruning must not
      // narrow the dim below its full row width, or Spark's own
      // width-scaled Project estimate broadcasts without any rule and
      // the audit stops discriminating
      .groupBy(col("d_pri"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("s"))
      .orderBy(col("d_pri"))

    val on = shape(q())
    val onRows = q().collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.snapshot.statsBroadcast", "false")
    val off = shape(q())
    val offRows = q().collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.snapshot.statsBroadcast", "true")

    println(s"AUDIT14 dim=$dimBytes bytes factFiles=$factFilesTotal " +
      s"ruleOn=(bhj=${on._1},smj=${on._2},factScan=${on._3}) " +
      s"ruleOff=(bhj=${off._1},smj=${off._2},factScan=${off._3})")
    assert(on._1 == 1 && on._2 == 0,
      "index-pruned join audit: expected static BHJ with the rule on")
    assert(off._1 == 0 && off._2 == 1,
      "index-pruned join audit: expected SMJ with the rule off")
    assert(onRows == offRows, "rule must never change results")

    // fact-side pruning is orthogonal (scattered dim keys touch every
    // file): a SPARSE dim plans only the posting files
    val sparse = shape(six.innerJoinPruned(spark, fact, "o_orderkey", idx,
      Tables.orders(spark, dir).filter(col("o_orderkey") % 9973 === 0)
        .select(col("o_orderkey").as("d_key")),
      "d_key", autoRefresh = false)
      .agg(count(lit(1)).as("n")))
    println(s"AUDIT14b sparse factScan=${sparse._3} of $factFilesTotal")
    assert(sparse._3 < factFilesTotal,
      "sparse dim must plan only the posting-file subset of the fact")
    println("AUDIT14 OK")
    spark.stop()
  }
}
