package graft.sources

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
}
