package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotTable

/** Runtime join-key pruning must (a) plan only the dim-relevant files
  * of the fact table and (b) be result-identical to the plain join —
  * with an over-cap dim falling back to the unpruned scan rather than
  * collecting unbounded keys.
  */
class DynamicFilterJoinSpec extends SparkSpec {

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // AQE materializes exchanges as LEAF QueryStageExec nodes — descend
    // every wrapper or a broadcast-side scan is invisible
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case s: FileSourceScanExec => Seq(s); case _ => Seq.empty }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case other                    => other.children
      }
      self ++ kids.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  private lazy val table: String = {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("dynjoin")
      .resolve("t").toString
    val rows = (1 to 400).map { i =>
      (i.toLong, s"t${i % 8}", i * 1.5)
    }
    SnapshotTable.create(spark, t,
      rows.toDF("id", "etype", "value"), "etype")
    t
  }

  private def dim(types: String*): DataFrame = {
    import spark.implicits._
    types.toDF("dtype")
  }

  private def rollup(df: DataFrame): Seq[String] =
    df.groupBy(col("etype")).agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .orderBy(col("etype")).collect().map(_.toString).toSeq

  // metrics post once per fresh plan — every measurement below builds
  // its own DataFrame (re-collecting a measured df reports stale zeros)
  private def prunedJoin() = {
    val fact = SnapshotTable.read(spark, table)
    DynamicFilterJoin.inner(fact, "etype", dim("t1", "t3"), "dtype")
  }

  test("the dim's keys prune the fact scan to the matching partitions' " +
    "files, and the result matches the plain join") {
    val fact = SnapshotTable.read(spark, table)
    val total = scannedFiles(SnapshotTable.read(spark, table))
    val plain = fact.join(dim("t1", "t3"), fact("etype") === col("dtype"))
    assert(rollup(prunedJoin()) === rollup(plain))
    val prunedN = scannedFiles(prunedJoin())
    assert(prunedN < total)
    assert(prunedN === scannedFiles(SnapshotTable.read(spark, table)
      .filter(col("etype").isin("t1", "t3"))))
  }

  test("a dim past the key cap falls back to the plain unpruned join") {
    val fact = SnapshotTable.read(spark, table)
    val wide = dim((0 until 8).map(i => s"t$i"): _*)
    assert(scannedFiles(DynamicFilterJoin.inner(
      SnapshotTable.read(spark, table), "etype", wide, "dtype",
      maxKeys = 3)) === scannedFiles(SnapshotTable.read(spark, table)))
    assert(rollup(DynamicFilterJoin.inner(
      SnapshotTable.read(spark, table), "etype", wide, "dtype",
      maxKeys = 3)) ===
      rollup(fact.join(wide, fact("etype") === col("dtype"))))
  }

  test("a NULL dim key cannot mask an over-cap dim into an incomplete " +
    "IN seed (nulls are excluded before the cap sample)") {
    import spark.implicits._
    val fact = SnapshotTable.read(spark, table)
    // 4 distinct non-null keys + a NULL, cap 3: over-cap must be
    // detected (NULL must not eat a sample slot) → plain-join fallback
    // with every matching row present
    val tricky = (Seq("t0", "t1", "t2", "t3").map(Option(_)) :+
      Option.empty[String]).toDF("dtype")
    val joined = DynamicFilterJoin.inner(
      SnapshotTable.read(spark, table), "etype", tricky, "dtype",
      maxKeys = 3)
    assert(rollup(joined) ===
      rollup(fact.join(tricky, fact("etype") === col("dtype"))))
    assert(joined.count() === 200L) // 4 of 8 types × 50 rows each
  }

  test("an empty or all-null dim yields an empty inner join without " +
    "scanning the fact side pathologically") {
    import spark.implicits._
    val fact = SnapshotTable.read(spark, table)
    assert(DynamicFilterJoin.inner(fact, "etype", dim(), "dtype")
      .count() === 0L)
    val nullDim = Seq(Option.empty[String]).toDF("dtype")
    assert(DynamicFilterJoin.inner(fact, "etype", nullDim, "dtype")
      .count() === 0L)
  }
}
