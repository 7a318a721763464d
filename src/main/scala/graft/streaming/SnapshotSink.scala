package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{QueryPack, Tables}
import graft.sources.SnapshotTable

/** `[EXT]` streaming sink committing each micro-batch as one atomic
  * snapshot-table version — the exactly-once parquet sink done with
  * table commits instead of batch-scoped directory overwrites (compare
  * [[EventStreams.etlToParquet]], whose sink needs a `batch_id=` dir
  * per batch and leaves readers to union an ever-growing directory
  * tree; here readers see ONE table that is never mid-batch).
  *
  * Exactly-once under retry comes from
  * [[SnapshotTable.commitAppend]]'s idempotence tag (`b<batchId>`): a
  * re-delivered batch finds its tag in the current manifest and no-ops;
  * a crashed attempt's files are referenced by no manifest, so they are
  * invisible to readers and reclaimed by vacuum. Downstream consumers
  * get snapshot isolation for free — a reader planned at version N is
  * unaffected by batches landing while it runs — and
  * [[SnapshotTable.compact]] folds the per-batch small files without
  * changing the data (the maintenance pass a micro-batch cadence
  * makes mandatory).
  */
object SnapshotSink extends QueryPack {

  /** Stream the events corpus (AvailableNow over the staged source)
    * into a snapshot table, one commit per micro-batch, partitioned by
    * event_type. Returns the table path.
    */
  def run(spark: SparkSession, dir: String, table: String,
          checkpoint: Option[String] = None): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val source = spark.readStream
      .schema(Tables.load(spark, dir, "events").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(DocDedupStream.stagedDir(dir, "events.parquet"))
      .transform(Tables.tsToTimestamp)

    if (SnapshotTable.versions(spark, table).isEmpty)
      SnapshotTable.createEmpty(spark, table) // every batch rides the tagged path
    val q = source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // retry on version conflicts: a maintenance commit (compact,
        // vacuum-era delete) racing the sink must not fail the stream —
        // the rebase re-reads the ledger, so a replayed tag still no-ops
        SnapshotTable.commitWithRetry() {
          SnapshotTable.commitAppend(batch.sparkSession, table, batch,
            "event_type", tag = Some(s"b$batchId"))
        }
        ()
      }
      .option("checkpointLocation",
        checkpoint.getOrElse(StreamHousekeeping.freshCheckpointDir()))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table
  }

  /** Driver query: stream-commit the corpus, then report per-type
    * counts and value sums FROM THE TABLE — identical to the same
    * rollup computed directly on `events` (the oracle), which only
    * holds if every row landed exactly once.
    */
  def streamEtlQuery(s: SparkSession, dir: String): DataFrame = {
    val table = java.nio.file.Files
      .createTempDirectory("graft_snapsink").resolve("t").toString
    run(s, dir, table)
    SnapshotTable.read(s, table)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_stream_snapshot_etl" -> (streamEtlQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_stream_snapshot_etl" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
