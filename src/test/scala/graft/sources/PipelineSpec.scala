package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pipeline DAG must equal a full batch recompute after EVERY
  * window shape — append-only, update (incl. rows crossing the
  * transform's filter in both directions), key move across output
  * partitions, delete — maintain keyed transforms at delta cost
  * (`merge`, one atomic commit), fall back loudly to `full` for
  * unkeyed rewrite windows, no-op on unchanged inputs, and refuse
  * malformed DAGs at construction.
  */
class PipelineSpec extends SparkSpec {

  import Pipeline._

  private def root(): String =
    java.nio.file.Files.createTempDirectory("pipespec").toString

  private def seedRows: Seq[(Long, String, Double)] =
    (1 to 60).map(i => (i.toLong, s"g${i % 3}", i * 10.0))

  private def seed(path: String): Unit = {
    import spark.implicits._
    SnapshotTable.create(spark, path,
      seedRows.toDF("id", "grp", "v"), "grp")
  }

  // transform: keep v >= 100, derive v2 = v * 2 (key-preserving,
  // row-wise; rows can move partitions via grp updates)
  private def fn(df: DataFrame): DataFrame =
    df.filter(col("v") >= 100.0).withColumn("v2", col("v") * 2.0)

  private def pipe(r: String, keyed: Boolean = true): Pipeline =
    Pipeline(Seq(
      Source("src", s"$r/src"),
      Transform("t", s"$r/t", "src", "grp", fn,
        key = if (keyed) Some("id") else None),
      Agg("a", s"$r/a", "t", "grp", "v2")))

  private def expectedAgg(r: String): Seq[String] =
    fn(SnapshotTable.read(spark, s"$r/src"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v2").cast("decimal(18,2)")).cast("decimal(28,2)").as("total"))
      .orderBy(col("grp")).collect().map(_.toString).toSeq

  private def actualAgg(r: String): Seq[String] =
    SnapshotTable.read(spark, s"$r/a")
      .select(col("grp"), col("n"), col("total"))
      .orderBy(col("grp")).collect().map(_.toString).toSeq

  private def actions(p: Pipeline): Map[String, String] =
    p.refresh(spark).map(x => x.node -> x.action).toMap

  test("malformed DAGs are refused at construction") {
    intercept[IllegalArgumentException] {
      Pipeline(Seq(Source("a", "x"), Source("a", "y")))
    }
    intercept[IllegalArgumentException] {
      Pipeline(Seq(Transform("t", "x", "nope", "p", identity)))
    }
    intercept[IllegalArgumentException] {
      // t1 → t2 → t1 cycle
      Pipeline(Seq(
        Transform("t1", "x", "t2", "p", identity),
        Transform("t2", "y", "t1", "p", identity))).order
    }
  }

  test("init materializes the DAG; an unchanged refresh is all noops") {
    val r = root(); seed(s"$r/src")
    val p = pipe(r)
    p.init(spark)
    assert(actualAgg(r) === expectedAgg(r))
    val acts = actions(p)
    assert(acts("t") === "noop" && acts("a") === "noop")
  }

  test("append-only window: transform appends fn(inserts), agg " +
    "delta-refreshes, result equals the batch recompute") {
    import spark.implicits._
    val r = root(); seed(s"$r/src")
    val p = pipe(r)
    p.init(spark)
    SnapshotTable.commitAppend(spark, s"$r/src",
      Seq((101L, "g0", 55.0), (102L, "g1", 500.0)).toDF("id", "grp", "v"),
      "grp")
    val acts = actions(p)
    assert(acts("t") === "append" && acts("a") === "delta")
    assert(actualAgg(r) === expectedAgg(r))
  }

  test("update window with threshold crossings and a partition move: " +
    "one atomic merge retires, moves, and inserts exactly right") {
    val r = root(); seed(s"$r/src")
    val p = pipe(r)
    p.init(spark)
    // id=20 (v=200, in view) drops below the filter → must be retired;
    // id=5 (v=50, filtered) rises above → must appear;
    // id=30 (v=300, in view) moves g0→g2 AND changes value → must move
    val cur = SnapshotTable.read(spark, s"$r/src")
    SnapshotTable.commitMerge(spark, s"$r/src", cur
      .filter(col("id").isin(20L, 5L, 30L))
      .withColumn("v", when(col("id") === 20L, 10.0)
        .when(col("id") === 5L, 900.0).otherwise(333.0))
      .withColumn("grp", when(col("id") === 30L, "g2")
        .otherwise(col("grp"))),
      "id", "grp")
    val acts = actions(p)
    assert(acts("t") === "merge" && acts("a") === "delta")
    assert(actualAgg(r) === expectedAgg(r))
    // and the transform table itself matches fn(src) exactly
    val want = fn(SnapshotTable.read(spark, s"$r/src"))
      .orderBy(col("id")).collect().map(_.toString).toSeq
    val got = SnapshotTable.read(spark, s"$r/t")
      .select(col("id"), col("grp"), col("v"), col("v2"))
      .orderBy(col("id")).collect().map(_.toString).toSeq
    assert(got === want)
  }

  test("delete window: retired keys leave the transform and net out of " +
    "the agg; a replayed refresh is a no-op") {
    val r = root(); seed(s"$r/src")
    val p = pipe(r)
    p.init(spark)
    SnapshotTable.commitDelete(spark, s"$r/src",
      col("id").isin(12L, 24L, 36L), "grp")
    assert(actions(p)("t") === "merge")
    assert(actualAgg(r) === expectedAgg(r))
    val again = actions(p)
    assert(again("t") === "noop" && again("a") === "noop")
  }

  test("an unkeyed transform falls back to a loud full recompute under " +
    "a rewrite window — and is still correct") {
    val r = root(); seed(s"$r/src")
    val p = pipe(r, keyed = false)
    p.init(spark)
    SnapshotTable.commitDelete(spark, s"$r/src", col("id") === 20L, "grp")
    val acts = actions(p)
    assert(acts("t") === "full" && acts("a") === "delta")
    assert(actualAgg(r) === expectedAgg(r))
  }

  test("expectations: a window violating a transform's checks publishes " +
    "nothing and fails loudly") {
    import spark.implicits._
    val r = root(); seed(s"$r/src")
    val p = Pipeline(Seq(
      Source("src", s"$r/src"),
      Transform("t", s"$r/t", "src", "grp", fn, key = Some("id"),
        checks = Seq("v2 <= 2000.0")),
      Agg("a", s"$r/a", "t", "grp", "v2")))
    p.init(spark)
    val vT = SnapshotTable.currentVersion(spark, s"$r/t")
    // v=1500 → v2=3000 violates the expectation
    SnapshotTable.commitAppend(spark, s"$r/src",
      Seq((200L, "g1", 1500.0)).toDF("id", "grp", "v"), "grp")
    val e = intercept[IllegalArgumentException] { p.refresh(spark) }
    assert(e.getMessage.contains("CHECK"))
    assert(SnapshotTable.currentVersion(spark, s"$r/t") === vT)
    // a conforming window still flows
    SnapshotTable.commitDelete(spark, s"$r/src", col("id") === 200L, "grp")
    p.refresh(spark)
    assert(actualAgg(r) === expectedAgg(r))
  }

  test("maintain widens vacuum retention to the slowest consumer's " +
    "applied frontier — a later refresh still has its change window") {
    import spark.implicits._
    val r = root(); seed(s"$r/src")
    val p = pipe(r)
    p.init(spark) // consumers applied src@1
    // four more source commits with NO refresh in between
    (1 to 4).foreach { i =>
      SnapshotTable.commitAppend(spark, s"$r/src",
        Seq((500L + i, s"g${i % 3}", 400.0 + i)).toDF("id", "grp", "v"),
        "grp")
    }
    // by-the-book retention would keep only v5 — the guard must keep
    // back to v1 (the transform's applied frontier)
    val kept = p.maintain(spark, keepVersions = 1, minAgeMs = 0L).toMap
    assert(kept("src") === 5)
    assert(SnapshotTable.versions(spark, s"$r/src").min === 1L)
    p.refresh(spark)
    assert(actualAgg(r) === expectedAgg(r))
    // fully caught up: retention can now tighten
    p.maintain(spark, keepVersions = 1, minAgeMs = 0L)
    assert(SnapshotTable.versions(spark, s"$r/src").min ===
      SnapshotTable.currentVersion(spark, s"$r/src"))
  }

  test("chained transforms propagate deltas hop by hop in one refresh") {
    import spark.implicits._
    val r = root(); seed(s"$r/src")
    val p = Pipeline(Seq(
      Source("src", s"$r/src"),
      Transform("t1", s"$r/t1", "src", "grp", fn, key = Some("id")),
      Transform("t2", s"$r/t2", "t1", "grp",
        df => df.filter(col("v2") >= 400.0), key = Some("id")),
      Agg("a", s"$r/a", "t2", "grp", "v2")))
    p.init(spark)
    SnapshotTable.commitMerge(spark, s"$r/src",
      Seq((25L, "g1", 150.0), (26L, "g2", 260.0)).toDF("id", "grp", "v"),
      "id", "grp")
    val acts = actions(p)
    assert(acts("t1") === "merge" && acts("t2") === "merge" &&
      acts("a") === "delta")
    val want = fn(SnapshotTable.read(spark, s"$r/src"))
      .filter(col("v2") >= 400.0)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v2").cast("decimal(18,2)")).cast("decimal(28,2)").as("total"))
      .orderBy(col("grp")).collect().map(_.toString).toSeq
    assert(SnapshotTable.read(spark, s"$r/a")
      .select(col("grp"), col("n"), col("total"))
      .orderBy(col("grp")).collect().map(_.toString).toSeq === want)
    // lineage reflects the applied frontier
    val lin = p.lineage(spark).collect()
      .map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(lin("t1") === SnapshotTable.currentVersion(spark, s"$r/src"))
    assert(lin("t2") === SnapshotTable.currentVersion(spark, s"$r/t1"))
  }
}
