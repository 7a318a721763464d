package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.operators.MinHashDedup

/** Stream ≡ batch for the streaming near-dup dedup: the kept set must
  * equal a sequential greedy simulation (first arrival claims its band
  * buckets; a doc sharing any bucket with an earlier arrival is
  * suppressed) over the same arrival order.
  */
class DocDedupStreamSpec extends SparkSpec {

  import spark.implicits._

  // batch 1: three mutually-distinct docs; batch 2: two near-dup copies
  // (small edits of doc 0 / doc 1) and one novel doc
  private val batch1 = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the old stone bridge every single morning"),
    (1L, "colorless green ideas sleep furiously beneath a sky of improbable mathematics and warm rain"),
    (2L, "ships at anchor wait for the tide while gulls argue about nothing important on the pier"))
  private val batch2 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the old stone bridge every single evening"),
    (11L, "colorless green ideas sleep furiously beneath a sky of improbable mathematics and cold rain"),
    (12L, "entirely different subject matter concerning the taxonomy of deep sea invertebrates and their habits"))

  /** Greedy first-arrival simulation over batch-computed band keys. */
  private def greedyKept(arrival: Seq[(Long, String)]): Set[Long] = {
    val df = arrival.toDF("doc_id", "text")
    val keys = MinHashDedup.bandKeys(df, "doc_id", "text")
      .select(col("id"), col("band_id"), col("bucket"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet }
    val claimed = scala.collection.mutable.Set.empty[(Int, Long)]
    val kept = Set.newBuilder[Long]
    arrival.map(_._1).foreach { id =>
      val ks = keys(id)
      val novel = ks.count(k => !claimed.contains(k))
      ks.foreach(k => if (!claimed.contains(k)) claimed += k)
      if (novel == ks.size) kept += id
    }
    kept.result()
  }

  test("streaming near-dup dedup == sequential greedy batch on a " +
    "controlled two-batch arrival") {
    val src = Files.createTempDirectory("dds_src")
    def write(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("dds_stage")
      rows.toDF("doc_id", "text").coalesce(1).write
        .mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      val dst = Paths.get(src.toString, name)
      Files.copy(Paths.get(part), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    // mod-times force source ordering: batch1 strictly older
    write(batch1, "b1.parquet", 1000000L)
    write(batch2, "b2.parquet", 2000000L)

    val source = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) +
        col("doc_id") * lit(1000000L)))

    val claims = DocDedupStream.claimBands(source, "doc_id", "text", "ts", "1 hour")
    val name = s"dds_${System.nanoTime()}"
    val q = claims.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("dds_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val kept = spark.table(name)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") === MinHashDedup.bands)
      .collect().map(_.getLong(0)).toSet

    // all originals admitted; both near-dup copies suppressed; novel kept
    assert(kept.intersect(Set(0L, 1L, 2L)) == Set(0L, 1L, 2L))
    assert(!kept.contains(10L) && !kept.contains(11L),
      s"near-dup copies must be suppressed, kept=$kept")
    assert(kept.contains(12L), "novel doc must be admitted")
    // and the full kept set equals the greedy first-arrival simulation
    assert(kept == greedyKept(batch1 ++ batch2))
  }

  test("driver query q_stream_neardup: deterministic across runs, subset " +
    "of the corpus, suppressed docs are exactly the bucket-sharers") {
    val a = DocDedupStream.nearDupDedupStreaming(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val b = DocDedupStream.nearDupDedupStreaming(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "single-split arrival order makes the kept set stable")
    assert(a.nonEmpty)
    val ids = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a.toSet.subsetOf(ids.toSet))
    // parity with the greedy simulation in parquet row order
    val texts = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(a.toSet == greedyKept(texts))
    // litter bounds: staging is fixed per corpus (reused, not re-created),
    // and the catalog holds at most ONE neardup memory-sink table per
    // corpus — the earlier run's was dropped by the later one
    assert(DocDedupStream.stagedDir(sfDir, "documents.parquet") ==
      DocDedupStream.stagedDir(sfDir, "documents.parquet"))
    val sinkTables = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("neardup_"))
    assert(sinkTables.length <= 1, s"leaked sink tables: ${sinkTables.mkString(",")}")
  }
}
