package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Round-9 plan audit: (a) secondary-column manifest skipping for the
  * new q_snapshot_skip2, (b) ANN serve-path file pruning now that the
  * index lives on snapshot tables, (c) commit-metadata bytes on a
  * many-file table — the O(changed files) evidence. Cite in SCALE.md.
  */
object PlanAudit9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    for (name <- Seq("q_snapshot_skip2", "q_snapshot_delete", "q_ann_lsh",
        "q_ann_ivf", "q_ann_batch", "q_ann_batch_ivf",
        "q_snapshot_pushdown", "q_snapshot_zorder", "q_snapshot_changes",
        "q_snapshot_tail")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      val cart = "Cartesian".r.findAllIn(plan).length
      println(f"PLAN $name%-18s exchanges=${ex - bc}%2d broadcasts=$bc%2d " +
        f"cartesian=$cart files=${df.inputFiles.length}")
    }

    // (a) secondary-column skipping: files planned vs table total
    val st = graft.sources.SnapshotTable
    val ev = java.nio.file.Files.createTempDirectory("audit9ev")
      .resolve("t").toString
    st.create(spark, ev, Tables.events(spark, dir)
      .select(Seq("event_id", "ts", "event_type", "value").map(col): _*),
      "event_type", statsCols = Seq("ts", "event_id"))
    val evAll = st.read(spark, ev).inputFiles.length
    val evPruned = st.readRange(spark, ev, "event_id", 100d, 299d)
      .inputFiles.length
    println(s"SKIP2 files: all=$evAll event_id(100..299)=$evPruned " +
      "(pruned on the NON-cluster column via ts-correlation)")

    // (a2) Catalyst-pushdown skipping: files the EXECUTED plan scanned
    // (post listFiles pruning) for a plain .filter on the relation read
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case other => other.collect {
          case sc: FileSourceScanExec => Seq(sc)
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        }.flatten
      }
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    val pd = st.read(spark, ev)
      .filter(col("event_id").between(100, 299) &&
        col("event_type") =!= "error")
    println(s"PUSHDOWN files: all=${st.read(spark, ev).inputFiles.length} " +
      s"plain_filter_scanned=${scanned(pd)}")

    // (a3) Z-order: pruning on the dim a 1-D layout cannot skip
    val zo = java.nio.file.Files.createTempDirectory("audit9zo")
      .resolve("t").toString
    st.create(spark, zo, Tables.events(spark, dir)
      .select(Seq("event_id", "ts", "user_id", "event_type", "value").map(col): _*),
      "event_type", statsCols = Seq("ts"))
    val preUser = scanned(st.read(spark, zo).filter(col("user_id") <= 2))
    st.clusterZOrder(spark, zo, "event_type", "ts", "user_id")
    val zoAll = st.read(spark, zo).inputFiles.length
    val postUser = scanned(st.read(spark, zo).filter(col("user_id") <= 2))
    val postBoth = scanned(st.read(spark, zo).filter(col("user_id") <= 2 &&
      col("ts") < org.apache.spark.sql.functions.lit("2024-01-10 00:00:00")
        .cast("timestamp")))
    println(s"ZORDER files: pre_user_pred=$preUser (of all) " +
      s"post all=$zoAll user_pred=$postUser user+ts_pred=$postBoth")

    // (a4) bloom skipping: point lookups on an UNclustered key
    val bl = java.nio.file.Files.createTempDirectory("audit9bl")
      .resolve("t").toString
    st.create(spark, bl, Tables.orders(spark, dir)
      .select(Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderpriority").map(col): _*),
      "o_orderpriority", bloomCols = Seq("o_orderkey"))
    val blAll = st.read(spark, bl).inputFiles.length
    val blHit = scanned(st.read(spark, bl).filter(col("o_orderkey") === 7L))
    val blIn = scanned(st.read(spark, bl)
      .filter(col("o_orderkey").isin(1L, 7L, 32L, 33L, 34L)))
    val blMiss = scanned(st.read(spark, bl)
      .filter(col("o_orderkey") === 999999983L))
    println(s"BLOOM files: all=$blAll point=$blHit in5=$blIn absent=$blMiss")

    // (a5) partition evolution: exactness across mixed layouts
    val pe = java.nio.file.Files.createTempDirectory("audit9pe")
      .resolve("t").toString
    st.create(spark, pe, Tables.orders(spark, dir)
      .select(Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderpriority").map(col): _*), "o_orderpriority")
    st.commitAppend(spark, pe, Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 5)
      .select((col("o_orderkey") + 7000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
      "o_custkey")
    val peAll = st.read(spark, pe).inputFiles.length
    val pePrio = scanned(st.read(spark, pe)
      .filter(col("o_orderpriority") === "1-URGENT"))
    val peCust = scanned(st.read(spark, pe).filter(col("o_custkey") === 3L))
    println(s"PARTEVO files: all=$peAll prio_pred=$pePrio cust_pred=$peCust " +
      "(each generation prunes only by its own layout)")

    // (b) ANN index pruning: probed buckets' files vs index total
    val (lshPath, planes) = graft.operators.AnnSearch.ensureLshIndex(spark, dir)
    val lshAll = st.read(spark, lshPath).inputFiles.length
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lshPruned = graft.sources.TableIO.openAnnIndexBuckets(spark, lshPath,
      "lsh_bucket", graft.operators.AnnSearch.probeBuckets(q, planes))
      .inputFiles.length
    println(s"ANN files: lsh all=$lshAll probed=$lshPruned")

    // (c) commit metadata bytes: many-file table, 1-file append
    import spark.implicits._
    val fsDir = java.nio.file.Files.createTempDirectory("audit9meta")
      .resolve("t").toString
    st.create(spark, fsDir, spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 40).cast("string").as("p")), "p")
    (1 to 3).foreach(i => st.commitAppend(spark, fsDir,
      spark.range(4000L * i, 4000L * i + 2000)
        .select(col("id").as("k"), (col("id") % 40).cast("string").as("p")), "p"))
    val fs = new org.apache.hadoop.fs.Path(fsDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(fsDir, "_manifests")
    val before = fs.listStatus(mdir).map(_.getPath.getName).toSet
    val inventoryBytes = fs.listStatus(mdir)
      .filter(_.getPath.getName.startsWith("seg-")).map(_.getLen).sum
    val nFiles = st.readManifest(spark, fsDir,
      st.currentVersion(spark, fsDir)).size
    st.commitAppend(spark, fsDir, Seq((999999L, "0")).toDF("k", "p"), "p")
    val commitBytes = fs.listStatus(mdir)
      .filter(s => !before.contains(s.getPath.getName)).map(_.getLen).sum
    println(s"META table_files=$nFiles inventory_bytes=$inventoryBytes " +
      s"one_file_append_commit_bytes=$commitBytes")

    // (d) round-9 additions: span dedup shuffle shape; WAP publish and
    // RESTORE as O(changed)/O(segments) metadata commits on the same
    // many-file table
    for (name <- Seq("q_span_dedup", "q_snapshot_files", "q_snapshot_wap",
        "q_snapshot_restore", "q_snapshot_constraints",
        "q_snapshot_mview2")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      val cart = "Cartesian".r.findAllIn(plan).length
      println(f"PLAN $name%-22s exchanges=${ex - bc}%2d broadcasts=$bc%2d " +
        f"cartesian=$cart")
    }
    val preWap = fs.listStatus(mdir).map(_.getPath.getName).toSet
    st.stageAppend(spark, fsDir, Seq((1000000L, "0")).toDF("k", "p"),
      "p", "audit")
    st.publishStaged(spark, fsDir, "audit")
    val wapBytes = fs.listStatus(mdir)
      .filter(s => !preWap.contains(s.getPath.getName)).map(_.getLen).sum
    val preRestore = fs.listStatus(mdir).map(_.getPath.getName).toSet
    st.restoreTo(spark, fsDir, st.currentVersion(spark, fsDir) - 1)
    val restoreBytes = fs.listStatus(mdir)
      .filter(s => !preRestore.contains(s.getPath.getName)).map(_.getLen).sum
    println(s"WAP stage+publish_bytes=$wapBytes restore_commit_bytes=" +
      s"$restoreBytes (table_files=$nFiles)")
    spark.stop()
  }
}
