package graft
import org.apache.spark.sql.SparkSession

/** Round-8 plan audit: exchange/broadcast/cartesian/Expand counts for
  * the snapshot-table queries plus the file counts their manifest
  * pruning plans (the property directory listings can't give). Cite in
  * SCALE.md.
  */
object PlanAudit8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_snapshot_merge", "q_time_travel", "q_snapshot_skip",
        "q_snapshot_delete", "q_stream_snapshot_etl")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      val cart = "Cartesian".r.findAllIn(plan).length
      val expand = "Expand".r.findAllIn(plan).length
      println(f"PLAN $name%-22s exchanges=${ex - bc}%2d broadcasts=$bc%2d " +
        f"cartesian=$cart expand=$expand files=${df.inputFiles.length}")
    }
    // manifest pruning evidence on the shared scenario table
    val work = {
      // reuse the memoized scenario through the public query path above,
      // then audit the pruned vs full plans directly
      import org.apache.spark.sql.functions.col
      val t = java.nio.file.Files.createTempDirectory("audit8").resolve("t").toString
      graft.sources.SnapshotTable.create(spark, t,
        Tables.orders(spark, dir).select(Seq("o_orderkey", "o_custkey",
          "o_totalprice", "o_orderpriority").map(col): _*),
        "o_orderpriority", statsCols = Seq("o_orderkey"))
      t
    }
    val all = graft.sources.SnapshotTable.read(spark, work).inputFiles.length
    val part = graft.sources.SnapshotTable.readWhere(spark, work,
      "o_orderpriority", Seq("1-URGENT")).inputFiles.length
    val range = graft.sources.SnapshotTable.readRange(spark, work,
      "o_orderkey", 1d, 200d).inputFiles.length
    println(s"SKIP files: all=$all partition(1-URGENT)=$part keyrange(1..200)=$range")
    spark.stop()
  }
}
