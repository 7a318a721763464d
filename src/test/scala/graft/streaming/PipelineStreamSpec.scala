package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Pipeline, SnapshotTable}

/** The commit-log-driven pipeline runner must converge the DAG to
  * exactly the explicit-refresh state, and a RESTARTED run (fresh
  * checkpoint, same commits replayed from version 0) must be a pure
  * no-op — exactly-once comes from the node tags, not the checkpoint.
  */
class PipelineStreamSpec extends SparkSpec {

  test("stream-driven refresh equals batch recompute; a restarted run " +
    "with a fresh checkpoint changes nothing") {
    import spark.implicits._
    val r = java.nio.file.Files.createTempDirectory("pipestream").toString
    SnapshotTable.create(spark, s"$r/src",
      (1 to 60).map(i => (i.toLong, s"g${i % 3}", i * 10.0))
        .toDF("id", "grp", "v"), "grp")
    def fn(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("v") >= 100.0).withColumn("v2", col("v") * 2.0)
    val p = Pipeline(Seq(
      Pipeline.Source("src", s"$r/src"),
      Pipeline.Transform("t", s"$r/t", "src", "grp", fn, key = Some("id")),
      Pipeline.Agg("a", s"$r/a", "t", "grp", "v2")))
    p.init(spark)
    // an append and a rewriting update land after init
    SnapshotTable.commitAppend(spark, s"$r/src",
      Seq((101L, "g0", 500.0)).toDF("id", "grp", "v"), "grp")
    SnapshotTable.commitMerge(spark, s"$r/src",
      Seq((20L, "g2", 10.0)).toDF("id", "grp", "v"), "id", "grp")
    SnapshotSink.runPipeline(spark, p, s"$r/src")
    def agg: Seq[String] = SnapshotTable.read(spark, s"$r/a")
      .select(col("grp"), col("n"), col("total"))
      .orderBy(col("grp")).collect().map(_.toString).toSeq
    val want = fn(SnapshotTable.read(spark, s"$r/src"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v2").cast("decimal(18,2)")).cast("decimal(28,2)").as("total"))
      .orderBy(col("grp")).collect().map(_.toString).toSeq
    assert(agg === want)
    // restart with a FRESH checkpoint: every window replays from v0,
    // every node refresh no-ops on its applied frontier
    val vA = SnapshotTable.currentVersion(spark, s"$r/a")
    val vT = SnapshotTable.currentVersion(spark, s"$r/t")
    SnapshotSink.runPipeline(spark, p, s"$r/src")
    assert(SnapshotTable.currentVersion(spark, s"$r/a") === vA)
    assert(SnapshotTable.currentVersion(spark, s"$r/t") === vT)
    assert(agg === want)
  }
}
