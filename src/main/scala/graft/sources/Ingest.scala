package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{QueryPack, Tables}

/** `[EXT]` ingestion-format surface — the raw-data edge of the pipeline.
  * The parquet tables everything else reads are the CURATED form; crawls
  * and exports arrive as CSV and JSONL, and an engine that claims the
  * full pipeline must read them with explicit schemas and account for
  * malformed records instead of silently dropping them.
  *
  *  - [[csvRoundtrip]] stages the documents corpus as quoted CSV once
  *    (fixed md5-keyed path, re-used across runs — no per-run litter),
  *    reads it back with an explicit schema, and proves field fidelity by
  *    joining to the source: the driver row says "every doc survived".
  *  - [[jsonlParse]] hand-assembles a JSONL line per document (identical
  *    concat in the oracle — engine-built `to_json` output is NOT
  *    byte-portable across engines), corrupts a deterministic 1-in-50
  *    subset by truncation, parses with `from_json` (PERMISSIVE: corrupt
  *    rows yield null structs, never exceptions), and reconciles: every
  *    well-formed line round-trips its fields, every corrupted line is
  *    counted, nothing vanishes.
  *
  * Scale shape: both are narrow per-row maps plus one join/aggregate on
  * the 8-byte doc_id — at 100 TB the CSV/JSONL read parallelizes per
  * file split like any text source, and malformed-record accounting
  * rides the same scan (no second pass).
  */
object Ingest extends QueryPack {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private val csvSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType), StructField("n_chars", LongType)))

  /** Stage a dataset once per deterministic path, ATOMICALLY: a bare
    * `Files.exists` gate would reuse a crashed partial write and race
    * concurrent stagers into ErrorIfExists failures. Instead: a staging
    * is valid only if its `_SUCCESS` marker exists (a marker-less dir is
    * a crashed write — removed and redone); writers write to a private
    * temp sibling and RENAME into place, so readers only ever see
    * nothing or a complete staging; a loser of the rename race discards
    * its own copy and reuses the winner's.
    */
  /** Deterministic staging path for a derivation of `sources`: keyed by
    * md5 over the source paths PLUS each source file's (name, length,
    * mtime). A key of the path alone goes stale when the data at that
    * path is regenerated — the staged cache then silently serves the OLD
    * derivation while queries recomputing from source see the NEW data,
    * de-synchronizing engine and oracle. Folding the content fingerprint
    * in makes regeneration produce a fresh key (the old staging is just
    * an orphan in tmpdir).
    */
  private[graft] def stagedPath(spark: SparkSession, prefix: String,
                                sources: Seq[String]): java.nio.file.Path = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def add(s: String): Unit =
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    sources.foreach { src =>
      add(src)
      val p = new org.apache.hadoop.fs.Path(src)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        fs.listStatus(p).sortBy(_.getPath.getName.toString).foreach(st =>
          add(s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"))
    }
    Paths.get(System.getProperty("java.io.tmpdir"),
      prefix + md.digest().map("%02x".format(_)).mkString)
  }

  private[graft] def ensureStaged(path: java.nio.file.Path)(write: String => Unit): String = {
    def complete = Files.exists(path.resolve("_SUCCESS"))
    if (!complete) {
      if (Files.exists(path)) deleteRec(path) // crashed partial staging
      val tmp = path.resolveSibling(
        s"${path.getFileName}__stage_${java.util.UUID.randomUUID.toString.take(8)}")
      write(tmp.toString)
      try Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException =>
          // lost the rename race — reuse the winner's staging if complete
          deleteRec(tmp)
          require(complete, s"concurrent staging of $path left no valid copy")
      }
    }
    path.toString
  }

  private def deleteRec(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** Stage documents as CSV once per corpus (deterministic path). */
  private[sources] def ensureCsv(s: SparkSession, dir: String): String =
    ensureStaged(stagedPath(s, "graft_ingest_csv_",
      Seq(s"$dir/documents.parquet"))) { tmp =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        .write.option("header", "true").option("quoteAll", "true")
        .csv(tmp)
    }

  /** CSV write → schema-checked read → join-back fidelity report. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val back = s.read.option("header", "true").schema(csvSchema)
      .csv(ensureCsv(s, dir))
      .select(col("doc_id").as("r_id"), col("lang").as("r_lang"),
        col("text").as("r_text"), col("n_chars").as("r_n"))
    Tables.documents(s, dir)
      .join(back, col("doc_id") === col("r_id"), "full_outer")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("doc_id").isNull || col("r_id").isNull, 1L).otherwise(0L))
          .as("n_unmatched"),
        sum(when(col("text") === col("r_text") && col("lang") === col("r_lang")
          && col("n_chars") === col("r_n"), 1L).otherwise(0L)).as("n_identical"))
  }

  /** The JSONL line for a document — concat, not to_json, so the oracle
    * builds the identical bytes. Corpus texts are word-soup (no quotes,
    * no backslashes, no control chars), asserted by the spec, so no
    * escaping is needed to stay valid JSON.
    */
  private def jsonLine = concat(
    lit("{\"doc_id\": "), col("doc_id"),
    lit(", \"lang\": \""), col("lang"),
    lit("\", \"text\": \""), col("text"), lit("\"}"))

  /** JSONL parse with malformed-record accounting: 1-in-50 lines are
    * truncated (deterministically, by doc_id), PERMISSIVE from_json
    * yields null structs for exactly those, and the report reconciles
    * totals + field fidelity of the survivors.
    */
  def jsonlParse(s: SparkSession, dir: String): DataFrame = {
    val corrupted = when(col("doc_id") % 50 === 0,
      expr("substring(line, 1, length(line) - 5)")).otherwise(col("line"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), jsonLine.as("line"))
      .withColumn("line", corrupted)
      .withColumn("p", from_json(col("line"),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("lang", StringType), StructField("text", StringType)))))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("p.doc_id").isNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("p.doc_id") === col("doc_id") && col("p.lang") === col("lang"),
          1L).otherwise(0L)).as("n_roundtrip"))
  }

  /** Stage documents as ORC once per corpus (deterministic path) — the
    * columnar sibling of [[ensureCsv]]; Spark ships the ORC reader/writer
    * in core, and a pipeline claiming format breadth should prove the
    * typed round-trip, not assume it.
    */
  private[sources] def ensureOrc(s: SparkSession, dir: String): String =
    ensureStaged(stagedPath(s, "graft_ingest_orc_",
      Seq(s"$dir/documents.parquet"))) { tmp =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        .write.orc(tmp)
    }

  /** ORC write → read → join-back fidelity report (schema carried by the
    * format itself, unlike CSV).
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val back = s.read.orc(ensureOrc(s, dir))
      .select(col("doc_id").as("r_id"), col("lang").as("r_lang"),
        col("text").as("r_text"), col("n_chars").as("r_n"))
    Tables.documents(s, dir)
      .join(back, col("doc_id") === col("r_id"), "full_outer")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("doc_id").isNull || col("r_id").isNull, 1L).otherwise(0L))
          .as("n_unmatched"),
        sum(when(col("text") === col("r_text") && col("lang") === col("r_lang")
          && col("n_chars") === col("r_n"), 1L).otherwise(0L)).as("n_identical"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_csv_roundtrip" -> (csvRoundtrip _),
    "q_orc_roundtrip" -> (orcRoundtrip _),
    "q_jsonl_parse"   -> (jsonlParse _))

  override def oracleSql: Map[String, String] = Map(
    // the pinned claim: NOTHING is lost or altered by the CSV round-trip
    "q_csv_roundtrip" ->
      """SELECT count(*) AS n_rows, CAST(0 AS BIGINT) AS n_unmatched,
        |  count(*) AS n_identical FROM documents""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT count(*) AS n_rows, CAST(0 AS BIGINT) AS n_unmatched,
        |  count(*) AS n_identical FROM documents""".stripMargin,
    // corrupt set = exactly the doc_id % 50 = 0 rows; all others round-trip
    "q_jsonl_parse" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_corrupt,
        |  CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_roundtrip
        |FROM documents""".stripMargin)
}
