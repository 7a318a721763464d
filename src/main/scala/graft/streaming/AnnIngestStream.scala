package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.AnnSearch

/** Continuous ANN index maintenance — the streaming form of
  * [[AnnSearch.appendToLshIndex]]: a stream of new vectors is consumed one
  * micro-batch at a time, each batch hashed with the index's persisted
  * sidecar planes and appended into the existing bucket partition
  * directories. Serving is never interrupted: appended files land inside
  * the same partition-pruned layout a concurrent reader prunes.
  *
  * Failure semantics: file-source micro-batches are at-least-once on
  * recovery, and the append path's duplicate-id guard turns a replayed
  * batch into a LOUD `IllegalArgumentException` instead of silently
  * double-inserting vectors into a served index — growth is effectively
  * exactly-once or the job stops. The checkpoint location is
  * caller-supplied and must be durable (the
  * [[EventStreams]] ETL-sink contract).
  */
object AnnIngestStream {

  def ingestLsh(spark: SparkSession, srcDir: String, indexPath: String,
                schema: StructType, checkpointDir: String): Unit =
    runIngest(spark, srcDir, schema, checkpointDir) { batch =>
      AnnSearch.appendToLshIndex(spark, indexPath, batch)
    }

  /** IVF twin of [[ingestLsh]]: each micro-batch is assigned to its
    * nearest PERSISTED centroid (the quantizer stays frozen between
    * offline rebuilds — [[AnnSearch.appendToIvfIndex]]) and appended into
    * the list partition directories. Same at-least-once + loud-guard
    * failure semantics.
    */
  def ingestIvf(spark: SparkSession, srcDir: String, indexPath: String,
                schema: StructType, checkpointDir: String): Unit =
    runIngest(spark, srcDir, schema, checkpointDir) { batch =>
      AnnSearch.appendToIvfIndex(spark, indexPath, batch)
    }

  private def runIngest(spark: SparkSession, srcDir: String, schema: StructType,
                        checkpointDir: String)(append: DataFrame => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) append(batch.toDF())
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
