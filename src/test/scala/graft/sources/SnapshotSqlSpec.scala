package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The snapshot TVF surface: `snapshot_table` / `snapshot_changes` in
  * plain SQL, resolving to the same FileIndex-backed relations the
  * Scala API plans — including WHERE pushdown into manifest skipping.
  */
class SnapshotSqlSpec extends SparkSpec {

  private lazy val table: String = {
    val t = java.nio.file.Files.createTempDirectory("snapsql")
      .resolve("t").toString
    SnapshotTable.create(spark, t,
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority")),
      "o_orderpriority", statsCols = Seq("o_orderkey"))
    SnapshotSql.register(spark)
    t
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case other => other.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("snapshot_table(path) equals the Scala read; WHERE pushes into " +
    "manifest file skipping") {
    val viaSql = spark.sql(s"SELECT * FROM snapshot_table('$table')")
    assert(viaSql.count() === SnapshotTable.read(spark, table).count())

    val total = SnapshotTable.readManifest(spark, table, 1L).size
    val pruned = spark.sql(
      s"SELECT * FROM snapshot_table('$table') WHERE o_orderkey < 100")
    assert(scannedFiles(pruned) < total)
    assert(pruned.count() ===
      Tables.orders(spark, sfDir).filter(col("o_orderkey") < 100).count())
  }

  test("snapshot_table(path, version) time-travels; snapshot_changes " +
    "returns the tagged feed") {
    table // force fixture + registration
    val t2 = java.nio.file.Files.createTempDirectory("snapsql2")
      .resolve("t").toString
    SnapshotTable.create(spark, t2,
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority")),
      "o_orderpriority")
    val batch = Tables.orders(spark, sfDir).limit(7)
      .select((col("o_orderkey") + 5000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
    SnapshotTable.commitAppend(spark, t2, batch, "o_orderpriority")

    val v1n = spark.sql(s"SELECT * FROM snapshot_table('$t2', 1)").count()
    val v2n = spark.sql(s"SELECT * FROM snapshot_table('$t2', 2)").count()
    assert(v2n === v1n + 7)

    val feed = spark.sql(
      s"""SELECT _change_type, _commit_version, count(*) AS n
         |FROM snapshot_changes('$t2', 1, 2)
         |GROUP BY 1, 2""".stripMargin).collect()
    assert(feed.length === 1)
    assert(feed.head.getString(0) === "insert")
    assert(feed.head.getLong(1) === 2L)
    assert(feed.head.getLong(2) === 7L)
  }

  test("non-literal and wrong-arity arguments fail loudly") {
    table
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM snapshot_table(1)").collect()
    }
    assert(e1.getMessage.contains("string literal") ||
      e1.getMessage.contains("snapshot_table"))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_changes('$table', 1)").collect()
    }
    assert(e2.getMessage.contains("3 arguments") ||
      e2.getMessage.contains("snapshot_changes"))
  }

  test("snapshot_history and snapshot_files expose the metadata surface " +
    "through SQL") {
    val t = table
    val hist = spark.sql(
      s"SELECT version, n_rows FROM snapshot_history('$t') ORDER BY version")
      .collect()
    assert(hist.map(_.getLong(0)).toSeq ===
      SnapshotTable.versions(spark, t))
    // per-partition row accounting from files metadata matches the data
    val metaRows = spark.sql(
      s"""SELECT partition, sum(n_rows) AS n FROM snapshot_files('$t')
         |GROUP BY partition ORDER BY partition""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val dataRows = SnapshotTable.read(spark, t)
      .groupBy("o_orderpriority").count().orderBy("o_orderpriority")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(metaRows === dataRows)
    // pinned-version form
    val vOld = SnapshotTable.versions(spark, t).head
    assert(spark.sql(s"SELECT sum(n_rows) FROM snapshot_files('$t', $vOld)")
      .head().getLong(0) ===
      SnapshotTable.readVersion(spark, t, vOld).count())
    // the per-version stats profile through SQL: every cell a manifest
    // fold, row counts matching the time-travel reads exactly
    val prof = spark.sql(
      s"""SELECT version, n_rows, min_val, max_val
         |FROM snapshot_stats('$t', 'o_orderkey')
         |ORDER BY version""".stripMargin).collect()
    assert(prof.map(_.getLong(0)).toSeq === SnapshotTable.versions(spark, t))
    prof.foreach { r =>
      assert(r.getLong(1) ===
        SnapshotTable.readVersion(spark, t, r.getLong(0)).count())
      assert(!r.isNullAt(2) && !r.isNullAt(3))
    }
  }
}
