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

  test("descending top-k prunes too (span-sound summary), and KEEPS " +
    "pruning after a delta refresh: segments preserve the span " +
    "property, so both directions stay armed at ingest cadence") {
    val t = clusteredTable()
    def desc() = SnapshotTable.read(spark, t)
      .orderBy(col("v").desc, col("k")).limit(25)
      .select(col("k"), col("v"))
    val (slowRows, slowFiles) = withRuleOff {
      val d = desc(); (rows(d), filesRead(d))
    }
    assert(rows(desc()) === slowRows)
    assert(filesRead(desc()) < slowFiles)

    // append + delta refresh -> a fresh SEGMENT, spans preserved; the
    // appended rows sit at the BOTTOM of the value range, so the DESC
    // top-25 answer is unchanged but the proof must now span segments
    import spark.implicits._
    SnapshotTable.commitAppend(spark, t,
      (0 until 200).map(i => (90000L + i, (i % 100).toDouble, "all"))
        .toDF("k", "v", "p"), "p")
    val (rf, delta) = RankStats.refresh(spark, t)
    assert(delta, "append window must take the delta path")
    assert(rf.summaries.forall(_.spans), "delta segments must keep spans")
    val descRows2 = withRuleOff { rows(desc()) }
    assert(rows(desc()) === descRows2)
    assert(filesRead(desc()) < withRuleOff { filesRead(desc()) },
      "a span-preserving delta refresh must keep the DESC threshold armed")
    def asc() = SnapshotTable.read(spark, t)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    val ascRowsOff = withRuleOff { rows(asc()) }
    assert(rows(asc()) === ascRowsOff)
    assert(filesRead(asc()) < withRuleOff { filesRead(asc()) },
      "ASC needs no span property - cum <= true rank holds across segments")

    // a LEGACY merged summary (single span-less segment) still refuses
    // DESC - the honest fallback for sidecars written by the old path
    val merged = rf.summaries.reduce(RankStats.merge)
    assert(!merged.spans)
    assert(RankStats.SegmentView(Seq(merged)).descThreshold(25).isEmpty,
      "a span-less segment must refuse the DESC threshold")
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

  test("a LONG sort column with values beyond 2^53 refuses the " +
    "rewrite: the summary's double image is lossy there, so a " +
    "threshold could cut a genuine top-k row") {
    val t = freshDir()
    import spark.implicits._
    // doubles cannot represent every long at this magnitude: +1/+2
    // offsets collapse onto even values when cast
    val big = (0 until 2000)
      .map(i => (i.toLong, (1L << 53) + i.toLong * 3L, "all"))
      .toDF("k", "v", "p")
    SnapshotTable.create(spark, t, big, "p", statsCols = Seq("v"))
    RankStats.analyze(spark, t, Seq("v"), m = 64)
    def q() = SnapshotTable.read(spark, t)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(q()) === withRuleOff { rows(q()) })
    assert(filesRead(q()) === withRuleOff { filesRead(q()) },
      "2^53-scale long values must refuse the threshold filter")
  }

  test("refusals: a non-partition filter and k beyond the provable " +
    "rows leave the plan alone; a STALE sidecar falls back to per-file " +
    "stats (pinned in the manifest, never stale) and still prunes") {
    val t = clusteredTable()
    // non-partition filter: rows passing it cannot be counted -> refuse
    def filtered() = SnapshotTable.read(spark, t)
      .filter(col("k") % 2 === 0)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(filtered()) === withRuleOff { rows(filtered()) })
    assert(filesRead(filtered()) === withRuleOff { filesRead(filtered()) })
    // append WITHOUT refresh: the sidecar fingerprint goes stale, but
    // tier 2 serves from the planned entries' own stats - exact parity
    // (the appended row is the new global minimum and must survive)
    import spark.implicits._
    SnapshotTable.commitAppend(spark, t,
      Seq((99999L, -1.0, "all")).toDF("k", "v", "p"), "p")
    def q() = SnapshotTable.read(spark, t)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(q()) === withRuleOff { rows(q()) })
    assert(rows(q()).exists(_.contains("99999")),
      "fixture sanity: the appended minimum must be in the top-k")
    assert(filesRead(q()) < withRuleOff { filesRead(q()) },
      "per-file stats must keep pruning when the sidecar is stale")
    // k > provable rows refuses (tiny table)
    val t2 = freshDir()
    SnapshotTable.create(spark, t2,
      (0 until 10).map(i => (i.toLong, i.toDouble, "all")).toDF("k", "v", "p"),
      "p", statsCols = Seq("v"))
    RankStats.analyze(spark, t2, Seq("v"), m = 64)
    def big() = SnapshotTable.read(spark, t2)
      .orderBy(col("v"), col("k")).limit(100).select(col("k"), col("v"))
    assert(rows(big()) === withRuleOff { rows(big()) })
  }

  /** 12k rows over 3 partitions, clustered on v within each — the
    * filtered-top-k fixture: a partition filter keeps whole files and
    * per-file stats prove the threshold within the slice.
    */
  private def partedTable(): String = {
    val t = freshDir()
    val df = spark.range(0, 12000).select(
      col("id").as("k"),
      ((col("id") * 6361L) % 12000L).cast("double").as("v"),
      concat(lit("p"), (col("id") % 3).cast("string")).as("p"))
    SnapshotTable.create(spark, t, df, "p", statsCols = Seq("v"))
    t
  }

  test("partition-filtered top-k prunes from per-file stats — the " +
    "shape the table-wide sidecar can never serve — in both " +
    "directions, with rule-off parity; IN filters too") {
    val t = partedTable()
    def asc() = SnapshotTable.read(spark, t)
      .filter(col("p") === "p1")
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    val (offRows, offFiles) = withRuleOff { val d = asc(); (rows(d), filesRead(d)) }
    assert(rows(asc()) === offRows)
    assert(filesRead(asc()) < offFiles,
      s"filtered ASC top-k must prune: ${filesRead(asc())} vs $offFiles")
    def desc() = SnapshotTable.read(spark, t)
      .filter(col("p") === "p1")
      .orderBy(col("v").desc, col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(desc()) === withRuleOff { rows(desc()) })
    assert(filesRead(desc()) < withRuleOff { filesRead(desc()) })
    def inq() = SnapshotTable.read(spark, t)
      .filter(col("p").isin("p0", "p2"))
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(inq()) === withRuleOff { rows(inq()) })
    assert(filesRead(inq()) < withRuleOff { filesRead(inq()) })
  }

  test("a table with NO rank sidecar at all still top-k-prunes from " +
    "its file stats (statsCols is enough; ANALYZE optional)") {
    val t = partedTable() // never rank-analyzed
    def q() = SnapshotTable.read(spark, t)
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(q()) === withRuleOff { rows(q()) })
    assert(filesRead(q()) < withRuleOff { filesRead(q()) },
      "bare top-k must prune from file stats without any sidecar")
  }

  test("the default-partition stamp is never a proof: a literal equal " +
    "to the stamp refuses, and NULL-partition files never count toward " +
    "another value's threshold") {
    val t = freshDir()
    val df = spark.range(0, 6000).select(
      col("id").as("k"),
      ((col("id") * 6361L) % 6000L).cast("double").as("v"),
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("p"), (col("id") % 2).cast("string"))).as("p"))
    SnapshotTable.create(spark, t, df, "p", statsCols = Seq("v"))
    // the stamp literal: rows written under it are NULL/'' on read, a
    // real string equal to the stamp is indistinguishable — unprovable
    // either way, so the rewrite must leave the plan alone
    def stampQ() = SnapshotTable.read(spark, t)
      .filter(col("p") === "__HIVE_DEFAULT_PARTITION__")
      .orderBy(col("v"), col("k")).limit(10).select(col("k"), col("v"))
    assert(rows(stampQ()) === withRuleOff { rows(stampQ()) })
    assert(filesRead(stampQ()) === withRuleOff { filesRead(stampQ()) },
      "the stamp literal must refuse the threshold rewrite")
    // a real partition value: stamped (NULL) files are excluded from
    // the accumulation, so the proven threshold covers only genuinely
    // passing rows — exact parity with the rule off
    def pq() = SnapshotTable.read(spark, t).filter(col("p") === "p1")
      .orderBy(col("v"), col("k")).limit(10).select(col("k"), col("v"))
    assert(rows(pq()) === withRuleOff { rows(pq()) })
  }

  test("a range predicate on the partition column refuses: only " +
    "whole-file equality/IN membership is a proof") {
    val t = partedTable()
    def rangeF() = SnapshotTable.read(spark, t)
      .filter(col("p") >= "p1")
      .orderBy(col("v"), col("k")).limit(25).select(col("k"), col("v"))
    assert(rows(rangeF()) === withRuleOff { rows(rangeF()) })
    assert(filesRead(rangeF()) === withRuleOff { filesRead(rangeF()) },
      "a partition RANGE cannot prove whole-file membership")
  }
}
