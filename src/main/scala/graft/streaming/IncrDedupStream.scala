package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.{QueryPack, Tables}
import graft.operators.{IncrementalDedup, MinHashDedup}

/** `[EXT]` STREAMING cross-run near-duplicate detection — the
  * `foreachBatch` front-end of [[IncrementalDedup]]: each micro-batch is
  * deduped against the PERSISTED band store (history is never re-banded,
  * let alone re-read beyond the candidate semi-join), then absorbed, so
  * the store after the stream equals a from-scratch build and a LATER
  * stream — or the batch path — picks up exactly where this one stopped.
  * This closes the gap between [[DocDedupStream]] (admission control
  * WITHIN one stream's state) and the batch near-dup passes (full
  * rescans): continuously-arriving corpora get pair-level dedup against
  * all history at per-batch cost.
  *
  * State layout under `statePath` (all plain parquet, readable by any
  * engine): `docs/` — absorbed documents (texts for candidate verify);
  * `bands/` — the (band_id, bucket, doc_id) postings; `results/` — the
  * accumulated verified pairs. The FIRST batch (no store yet) runs the
  * plain intra-batch pipeline; every later batch runs
  * [[IncrementalDedup.dedupNewBatch]].
  *
  * CLOSED FORM the oracle checks: streaming the corpus as
  * (history-file, batch-file) yields intra-history pairs (batch 0) plus
  * pairs touching the batch (batch 1) — together exactly the full-corpus
  * pair set, so `q_stream_incr_neardup` shares the `q_minhash_neardup`
  * oracle verbatim.
  *
  * Exactly-once state: every write is scoped to `batch_id=<id>` and
  * OVERWRITES its own scope (the [[EventStreams.etlToParquet]]
  * discipline), so a re-delivered micro-batch replaces its previous
  * attempt instead of appending twice. The stream checkpoint lives
  * UNDER `statePath`, which makes the whole directory the unit of
  * state: re-running over the same source resumes after the processed
  * files (batch ids never repeat — the checkpoint remembers), and the
  * spec drives exactly that restart.
  */
object IncrDedupStream extends QueryPack {

  /** Drive the stream to completion over `srcDir` (one staged file per
    * micro-batch), maintaining state under `statePath`; returns the
    * accumulated verified pairs.
    */
  def run(spark: SparkSession, srcDir: String, schema: StructType,
          statePath: String): DataFrame = {
    val bandsP = s"$statePath/bands"
    val docsP = s"$statePath/docs"
    val resultsP = s"$statePath/results"
    val source = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val q = source.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val s = batch.sparkSession
        val first = !java.nio.file.Files.exists(
          java.nio.file.Paths.get(bandsP))
        val pairs =
          if (first)
            MinHashDedup.nearDupPairs(batch, "doc_id", "text", threshold = 0.8)
          else
            IncrementalDedup.dedupNewBatch(
              s.read.parquet(docsP).select(
                schema.fieldNames.map(col).toSeq: _*),
              bandsP, batch)
        // batch_id-scoped + Overwrite = a retried batch replaces itself
        pairs.write.mode(SaveMode.Overwrite).parquet(s"$resultsP/batch_id=$id")
        batch.write.mode(SaveMode.Overwrite).parquet(s"$docsP/batch_id=$id")
        IncrementalDedup.absorbBatch(batch, s"$bandsP/batch_id=$id",
          mode = SaveMode.Overwrite)
        ()
      }
      .option("checkpointLocation", s"$statePath/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a run whose batches all produced zero pairs leaves only empty
    // scoped dirs — no parquet footers to infer from
    try spark.read.parquet(resultsP)
      .select(col("a_id"), col("b_id"), col("jac"))
      .orderBy(col("a_id"), col("b_id"))
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          StructType.fromDDL("a_id BIGINT, b_id BIGINT, jac DOUBLE"))
    }
  }

  /** Driver query: the documents corpus streamed as two mtime-ordered
    * files — history (the `q_incr_neardup` 9-in-10 slice) then the
    * md5-split batch — through fresh state each run (the stream mutates
    * its state; a per-run directory keeps verify/bench reruns
    * idempotent). The result's closed form is the FULL corpus pair set.
    */
  def streamIncrQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val work = java.nio.file.Files.createTempDirectory("graft_incr_stream")
    val src = work.resolve("src")
    java.nio.file.Files.createDirectories(src)
    def stage(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = work.resolve(s"stage_$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val dst = src.resolve(s"$name.parquet")
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dst)
      dst.toFile.setLastModified(mtime)
    }
    stage(docs.filter(!IncrementalDedup.isBatch), "part-0001", 1000000L)
    stage(docs.filter(IncrementalDedup.isBatch), "part-0002", 2000000L)
    run(s, src.toString, docs.schema, work.resolve("state").toString)
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_stream_incr_neardup" -> (streamIncrQuery _))

  /** Intra-history ∪ batch-touching ≡ all pairs — the one-shot oracle. */
  override def oracleSql: Map[String, String] = Map(
    "q_stream_incr_neardup" -> MinHashDedup.minhashNeardupOracle)
}
