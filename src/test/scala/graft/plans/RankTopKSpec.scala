package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{RankStats, SnapshotTable}

/** Rank-threshold top-k pushdown: ORDER BY col LIMIT k over a bare
  * snapshot relation gains a proven `col <= v` prefilter from the rank
  * summary, which manifest min/max skipping turns into FILE pruning on
  * a layout clustered on the column. Every plan assertion pairs with a
  * rule-off result-parity check — an unsound threshold that cuts a
  * true top-k row is exactly what these specs exist to catch.
  */
class RankTopKSpec extends SparkSpec {

  RankTopK.install(spark)

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ranktopk").resolve("t").toString

  /** 10k rows clustered on v (statsCols head = range-split + per-file
    * sort), so a v threshold prunes most files.
    */
  private def clusteredTable(withNulls: Boolean = false): String = {
    val t = freshDir()
    val base = spark.range(0, 10000).select(
      col("id").as("k"),
      ((col("id") * 6361L) % 10000L).cast("double").as("v"),
      lit("all").as("p"))
    val df = if (!withNulls) base
      else base.withColumn("v",
        when(col("k") % 100 === 0, lit(null)).otherwise(col("v")))
    SnapshotTable.create(spark, t, df, "p", statsCols = Seq("v"))
    RankStats.analyze(spark, t, Seq("v"), m = 128)
    t
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan): Long = {
      val self = p match {
        case s: FileSourceScanExec =>
          s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
            .flatMap(_.files).size.toLong
        case _ => 0L
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case other                    => other.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  private def withRuleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.snapshot.rankTopK", "false")
    try body
    finally spark.conf.set("spark.graft.snapshot.rankTopK", "true")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("ascending top-k reads a fraction of the files and returns " +
    "exactly the rule-off rows") {
    val t = clusteredTable()
    def q() = SnapshotTable.read(spark, t)
      .orderBy(col("v"), col("k")).limit(25)
      .select(col("k"), col("v"))
    val fast = q()
    val (slowRows, slowFiles) = withRuleOff {
      val d = q(); (rows(d), filesRead(d))
    }
    assert(rows(fast) === slowRows)
    val fastFiles = filesRead(q())
    assert(fastFiles < slowFiles,
      s"top-25 of a clustered column should prune files: $fastFiles vs $slowFiles")
  }

  test("descending top-k prunes too (span-sound summary), and a " +
    "delta-merged summary refuses DESC but still serves ASC") {
    val t = clusteredTable()
    def desc() = SnapshotTable.read(spark, t)
      .orderBy(col("v").desc, col("k")).limit(25)
      .select(col("k"), col("v"))
    val (slowRows, slowFiles) = withRuleOff {
      val d = desc(); (rows(d), filesRead(d))
    }
    assert(rows(desc()) === slowRows)
    assert(filesRead(desc()) < slowFiles)

    // delta refresh -> merged summary: spans lost
    import spark.implicits._
    SnapshotTable.commitAppend(spark, t,
      (0 until 200).map(i => (90000L + i, (i % 100).toDouble, "all"))
        .toDF("k", "v", "p"), "p")
    RankStats.refresh(spark, t)
    val descRows2 = withRuleOff { rows(desc()) }
    assert(rows(desc()) === descRows2)
    assert(filesRead(desc()) === withRuleOff { filesRead(desc()) },
      "merged summary must refuse the DESC threshold")
    def asc() = SnapshotTable.read(spark, t)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    val ascRowsOff = withRuleOff { rows(asc()) }
    assert(rows(asc()) === ascRowsOff)
    assert(filesRead(asc()) < withRuleOff { filesRead(asc()) },
      "ASC needs no span property - cum <= true rank holds for merges")
  }

  test("NULLS FIRST top-k keeps its null rows; parity with rule off") {
    val t = clusteredTable(withNulls = true)
    def q() = SnapshotTable.read(spark, t)
      .sort(col("v").asc_nulls_first, col("k")).limit(25)
      .select(col("k"), col("v"))
    val off = withRuleOff { rows(q()) }
    assert(rows(q()) === off)
    assert(off.count(_.contains("null")) > 0,
      "fixture must actually place nulls in the top-k")
  }

  test("refusals: a filtered child, a stale sidecar, and k beyond the " +
    "summarized rows all leave the plan alone") {
    val t = clusteredTable()
    // user filter changes which rows compete: must not fire
    def filtered() = SnapshotTable.read(spark, t)
      .filter(col("k") % 2 === 0)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(filtered()) === withRuleOff { rows(filtered()) })
    assert(filesRead(filtered()) === withRuleOff { filesRead(filtered()) })
    // stale sidecar: append without refresh
    import spark.implicits._
    SnapshotTable.commitAppend(spark, t,
      Seq((99999L, -1.0, "all")).toDF("k", "v", "p"), "p")
    def q() = SnapshotTable.read(spark, t)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(q()) === withRuleOff { rows(q()) })
    assert(filesRead(q()) === withRuleOff { filesRead(q()) },
      "stale fingerprint must refuse")
    // k > n refuses (fresh table, tiny summary)
    val t2 = freshDir()
    SnapshotTable.create(spark, t2,
      (0 until 10).map(i => (i.toLong, i.toDouble, "all")).toDF("k", "v", "p"),
      "p", statsCols = Seq("v"))
    RankStats.analyze(spark, t2, Seq("v"), m = 64)
    def big() = SnapshotTable.read(spark, t2)
      .orderBy(col("v"), col("k")).limit(100).select(col("k"), col("v"))
    assert(rows(big()) === withRuleOff { rows(big()) })
  }
}
