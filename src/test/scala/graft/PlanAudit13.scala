package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 (session 2) plan audit at sf0.1: (a) StatsBroadcast turns
  * the filtered-snapshot-dim join into a STATIC broadcast join at a
  * threshold where Spark's own (full-table) sizing plans a shuffle;
  * (b) an index-served key delete rewrites exactly the posting files,
  * a small fraction of the table; (c) the NDV overlap fold answers in
  * its exact regime from two sidecar reads. Cite in SCALE.md.
  */
object PlanAudit13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = graft.sources.SnapshotTable
    graft.plans.StatsBroadcast.install(spark)

    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    def joins(df: DataFrame): (Int, Int) = {
      val p = df.queryExecution.sparkPlan
      (p.collect { case b: BroadcastHashJoinExec => b }.size,
        p.collect { case s: SortMergeJoinExec => s }.size)
    }

    // ---- (a) stats-sized broadcast of a partition-filtered snapshot dim
    val base = java.nio.file.Files.createTempDirectory("audit13")
    val t = base.resolve("orders").toString
    st.create(spark, t, Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
      "o_orderpriority", statsCols = Seq("o_orderkey"))
    val (_, fullBytes, nFiles) = st.tableStats(spark, t)
    // between one priority slice (~1/5) and the full table: Spark's own
    // Filter sizing sees fullBytes and refuses; the manifest fold sees
    // the slice and broadcasts
    val threshold = fullBytes / 2
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    def q() = Tables.lineitem(spark, dir)
      .join(st.read(spark, t).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val on = joins(q())
    spark.conf.set("spark.graft.snapshot.statsBroadcast", "false")
    val off = joins(q())
    spark.conf.set("spark.graft.snapshot.statsBroadcast", "true")
    println(s"AUDIT13a table=$fullBytes bytes/$nFiles files threshold=$threshold " +
      s"ruleOn=(bhj=${on._1},smj=${on._2}) ruleOff=(bhj=${off._1},smj=${off._2})")
    assert(on == ((1, 0)) && off == ((0, 1)),
      "stats broadcast audit: expected static BHJ on / SMJ off")

    // ---- (b) index-served delete rewrites only posting files
    val six = graft.sources.SecondaryIndex
    val idx = base.resolve("idx").toString
    six.create(spark, t, "o_orderkey", idx, buckets = 16)
    val keys = Seq(7L, 4099L, 65539L, 120001L)
    val before = st.readManifest(spark, t, st.currentVersion(spark, t))
      .map(_.path).toSet
    val postings = six.lookupFiles(spark, t, "o_orderkey", idx, keys).get.toSet
    val (v2, nDel) = six.deleteKeys(spark, t, "o_orderkey", idx, keys,
      "o_orderpriority", autoRefresh = false)
    val after = st.readManifest(spark, t, v2).map(_.path).toSet
    println(s"AUDIT13b tableFiles=${before.size} postingFiles=${postings.size} " +
      s"rewritten=${(before -- after).size} deleted=$nDel")
    assert((before -- after) == postings && postings.size < before.size,
      "index delete audit: rewrite set must be the posting files")

    // ---- (c) NDV overlap in its exact regime (two sidecar reads)
    val ts = graft.sources.TableStats
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"))
    def side(name: String, et: String): ts.NdvSketch = {
      val p = base.resolve(name).toString
      st.create(spark, p, ev.filter(col("event_type") === et), "event_type")
      ts.analyze(spark, p, Seq("user_id"), k = 8192)
        .sketches.find(_.col == "user_id").get
    }
    val ov = ts.overlap(side("v", "view"), side("p", "purchase"))
    println(s"AUDIT13c exact=${ov.exact} union=${ov.union} intersect=${ov.intersect}")
    assert(ov.exact, "overlap audit: expected the exact regime at sf0.1")

    println("AUDIT13 OK")
    spark.stop()
  }
}
