package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.operators.Events
import graft.streaming.FunnelStream.{Ev, FunnelState}

/** The streaming funnel state machine: pure-transition semantics, and
  * stream ≡ batch across a controlled two-batch (cross-micro-batch state)
  * arrival.
  */
class FunnelStreamSpec extends SparkSpec {

  private val Unset = Long.MaxValue

  test("state transitions enforce the strict stage order") {
    val s0 = FunnelState(Unset, Unset, Unset)
    // click/purchase before any view: ignored
    assert(FunnelStream.advance(s0, Ev(1, 1, 100, "click")) === s0)
    assert(FunnelStream.advance(s0, Ev(1, 1, 100, "purchase")) === s0)
    val afterView = FunnelStream.advance(s0, Ev(1, 2, 200, "view"))
    assert(afterView === FunnelState(200, Unset, Unset))
    // purchase with a view but no qualified click: still ignored
    assert(FunnelStream.advance(afterView, Ev(1, 3, 300, "purchase")) === afterView)
    val afterClick = FunnelStream.advance(afterView, Ev(1, 4, 400, "click"))
    assert(afterClick === FunnelState(200, 400, Unset))
    val done = FunnelStream.advance(afterClick, Ev(1, 5, 500, "purchase"))
    assert(done === FunnelState(200, 400, 500))
    // the FIRST completion sticks
    assert(FunnelStream.advance(done, Ev(1, 6, 600, "purchase")) === done)
  }

  test("stream equals batch across a two-batch arrival with cross-batch state") {
    import spark.implicits._
    // user 1 completes within batch 1; user 2's purchase arrives in
    // batch 2 (state carries view+click); user 3's click AND purchase
    // arrive in batch 2 qualified by a batch-1 view; user 4 never views
    val batch1 = Seq(
      Ev(1, 10, 1000L, "view"), Ev(1, 11, 2000L, "click"), Ev(1, 12, 3000L, "purchase"),
      Ev(2, 20, 1500L, "view"), Ev(2, 21, 2500L, "click"),
      Ev(3, 30, 1800L, "view"),
      Ev(4, 40, 1900L, "click"))
    val batch2 = Seq(
      Ev(2, 22, 9000L, "purchase"),
      Ev(3, 31, 9100L, "click"), Ev(3, 32, 9200L, "purchase"),
      Ev(4, 41, 9300L, "purchase"))

    val src = Files.createTempDirectory("funnel_stream_src")
    def stage(evs: Seq[Ev], name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("funnel_stage")
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      val dst = Paths.get(src.toString, name)
      Files.copy(Paths.get(part), dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(batch1, "b1.parquet", 1000000L)
    stage(batch2, "b2.parquet", 2000000L)

    val source = spark.readStream
      .schema(batch1.toDS().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString)
      .as[Ev]
    val q = FunnelStream.detect(source).writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_spec")
      .option("checkpointLocation",
        Files.createTempDirectory("funnel_spec_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("funnel_spec")
      .groupBy(col("user_id"))
      .agg(min(col("started_us")).as("started_us"),
        min(col("completed_us")).as("completed_us"))
      .filter(col("completed_us").isNotNull)
      .select(col("user_id"), col("started_us"), col("completed_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = Events.funnelMatchOn(
      (batch1 ++ batch2).toDS()
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("tsMicros")).as("ts"), col("event_type")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(1L, 2L, 3L))
  }
}
