package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Events

/** Streaming results must equal their batch counterparts on the same
  * static input — the strongest correctness statement a local streaming
  * test can make.
  */
class EventStreamsSpec extends SparkSpec {

  test("streaming tumbling-window counts == batch date_trunc counts") {
    val streamed = EventStreams.hourlyCountsStreaming(spark, sfDir)
      .select("hour", "event_type", "n")
    val batch = Events.hourlyCounts(spark, sfDir)
      .select(col("hour"), col("event_type"), col("n"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("late-data accounting: an injected late event moves the dropped " +
    "count, not the finalized result") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val onTime = Seq(
      (ts("2024-01-01 10:00:00"), "click"),
      (ts("2024-01-01 10:20:00"), "click"),
      // the mover: after this batch the watermark sits at 12:30, well
      // past the 10:00 window's end, finalizing it
      (ts("2024-01-01 13:05:00"), "view"))
    // batch 2 exists so the 12:30 watermark is a full batch old by the
    // time the late row arrives — Spark's late-event filter in batch N
    // uses batch N−1's in-force watermark (see hourlyCountsWithDropReport
    // scaladoc), so a late row landing in batch 1 would be merged, not
    // counted as dropped
    val followup = Seq((ts("2024-01-01 13:10:00"), "view"))
    val third = Seq((ts("2024-01-01 13:15:00"), "view"))
    val late = Seq((ts("2024-01-01 10:15:00"), "click")) // < watermark ⇒ drop

    def run(last: Seq[(Timestamp, String)]): (Map[(String, String), Long], Long) = {
      val dir = java.nio.file.Files.createTempDirectory("late_acct")
      val staged = Seq(onTime, followup, last)
      val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
      // arrival order pinned by mtime: one file per micro-batch, in order
      staged.zipWithIndex.foreach { case (rows, i) =>
        val tmp = dir.resolve(s"stage$i")
        rows.toDF("ts", "event_type").coalesce(1).write.parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dst = src.resolve(f"part-$i%04d.parquet")
        java.nio.file.Files.move(java.nio.file.Paths.get(part), dst)
        dst.toFile.setLastModified(1000000L * (i + 1))
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType)))
      val (df, dropped) = EventStreams.hourlyCountsWithDropReport(
        spark, src.toString, schema)
      (df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
        dropped)
    }

    val (cleanResult, cleanDropped) = run(third)
    val (lateResult, lateDropped) = run(third ++ late)
    assert(cleanDropped === 0L)
    assert(lateDropped === 1L, "the late click must be counted as dropped")
    assert(lateResult === cleanResult,
      "a dropped late row must not change the finalized windows")
    assert(cleanResult(("2024-01-01 10:00:00", "click")) === 2L,
      "the 10:00 window must have finalized with its on-time rows")
  }

  test("streaming top-k through the custom aggregate == batch top-k") {
    val streamed = EventStreams.topkStreaming(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = graft.operators.Events.topkByType(spark, sfDir)
      .select(col("event_type"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("stream-stream banded join == batch join on the same input") {
    val streamed = EventStreams.purchaseClickJoinStreaming(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val batch = p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("stream-static dim enrichment == batch join+agg, broadcast planned") {
    val streamed = EventStreams.enrichStreaming(spark, sfDir)
    val batch = graft.Tables.events(spark, sfDir)
      .join(graft.Tables.customer(spark, sfDir),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val s = streamed.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = batch.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(b.nonEmpty)
    assert(s == b)
  }

  test("foreachBatch parquet ETL sink: rows round-trip, sink is " +
    "partition-pruned on event_type") {
    val out = java.nio.file.Files.createTempDirectory("graft_etl_sink").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_etl_ck").toString
    EventStreams.etlToParquet(spark, sfDir, out, checkpoint = Some(ck))
    val written = spark.read.parquet(out)
    val n = graft.Tables.events(spark, sfDir).count()
    assert(written.count() == n, "every event lands in the sink")
    assert(written.columns.contains("batch_id"), "batch-scoped idempotent layout")
    // idempotence: re-running against the SAME durable checkpoint finds
    // no new source data and must not duplicate the sink
    EventStreams.etlToParquet(spark, sfDir, out, checkpoint = Some(ck))
    assert(spark.read.parquet(out).count() == n, "re-run must not append dups")
    // partition pruning on the sink layout
    val one = written.filter(col("event_type") === "click")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"sink reads must prune on event_type:\n$plan")
  }

  test("streaming dropDuplicates key set == batch distinct") {
    val streamed = EventStreams.dedupStreaming(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionization == batch lag-window sessions") {
    val streamed = EventStreams.sessionizeStreaming(spark, sfDir)
      .filter(col("user_id") < 100)
    val batch = Events.sessions(spark, sfDir)
    assert(streamed.exceptAll(batch).count() == 0,
      "streaming sessions missing from batch")
    assert(batch.exceptAll(streamed).count() == 0,
      "batch sessions missing from streaming")
  }
}
