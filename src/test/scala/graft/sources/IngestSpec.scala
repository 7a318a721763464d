package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IngestSpec extends SparkSpec {

  test("corpus precondition: texts carry no JSON/CSV-hostile characters") {
    val bad = Tables.documents(spark, sfDir)
      .filter(col("text").rlike("[\"\\\\\\n\\r,]"))
      .count()
    assert(bad === 0L,
      "jsonLine/CSV staging rely on quote/backslash/newline/comma-free text")
  }

  test("CSV round-trip: every document survives with identical fields") {
    val r = Ingest.csvRoundtrip(spark, sfDir).head()
    val n = Tables.documents(spark, sfDir).count()
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === n)
  }

  test("ORC round-trip: every document survives with identical fields") {
    val r = Ingest.orcRoundtrip(spark, sfDir).head()
    val n = Tables.documents(spark, sfDir).count()
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === n)
  }

  test("JSONL parse: exactly the deterministic 1-in-50 subset is corrupt, rest round-trips") {
    val r = Ingest.jsonlParse(spark, sfDir).head()
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val nCorrupt = docs.filter(col("doc_id") % 50 === 0).count()
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === nCorrupt)
    assert(r.getLong(2) === n - nCorrupt)
    assert(nCorrupt > 0, "fixture must actually corrupt something")
  }

  test("staged CSV is reused, not rewritten, across calls") {
    val path = Ingest.ensureCsv(spark, sfDir)
    val before = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      .toArray.map(_.toString).toSet
    Ingest.csvRoundtrip(spark, sfDir).count()
    val after = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      .toArray.map(_.toString).toSet
    assert(after === before)
  }

  test("a crashed partial staging (no _SUCCESS) is discarded and redone") {
    import java.nio.file.{Files, Paths}
    val good = Paths.get(Ingest.ensureCsv(spark, sfDir))
    assert(Files.exists(good.resolve("_SUCCESS")),
      "valid staging must carry the completion marker")
    // simulate the crash: replace the staging with a marker-less husk
    Files.walk(good).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    Files.createDirectories(good)
    Files.writeString(good.resolve("part-00000.csv"), "doc_id\n999999\n")
    val r = Ingest.csvRoundtrip(spark, sfDir).head()
    // the husk must NOT have been served: full fidelity report again
    val n = Tables.documents(spark, sfDir).count()
    assert(r.getLong(0) === n && r.getLong(1) === 0L && r.getLong(2) === n)
    assert(Files.exists(good.resolve("_SUCCESS")), "staging must be rebuilt")
  }

  test("staging keys fingerprint source CONTENT: regenerating the data at " +
    "the same path yields a fresh key (stale caches are orphaned)") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("stage_key").resolve("d.parquet")
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "v").write.parquet(src.toString)
    val k1 = Ingest.stagedPath(spark, "t_", Seq(src.toString))
    assert(k1 === Ingest.stagedPath(spark, "t_", Seq(src.toString)),
      "same content, same key — caching still works")
    Thread.sleep(1100) // mtime granularity
    Seq((1L, "b")).toDF("k", "v").write.mode("overwrite").parquet(src.toString)
    val k2 = Ingest.stagedPath(spark, "t_", Seq(src.toString))
    assert(k1 !== k2, "regenerated source must produce a different key")
  }
}
