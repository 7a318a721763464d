package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextPrepSpec extends SparkSpec {

  test("redact replaces emails, IPs and phones and leaves the rest intact") {
    import spark.implicits._
    val cases = Seq(
      ("mail me at jo.doe+x@sub.example.org now",
       "mail me at [EMAIL] now"),
      ("server 192.168.0.1 and 10.0.0.255 up",
       "server [IP] and [IP] up"),
      ("call 555-123-4567 today", "call [PHONE] today"),
      // an email containing digits+dots is consumed by the email pass
      // before the IP pass can bite a fragment of it
      ("x 1.2.3.4@example.com y", "x [EMAIL] y"),
      // version strings don't have 4 numeric groups; 5 groups leave no
      // standalone boundary-delimited quad either side of the match
      ("v1.2.3 stays", "v1.2.3 stays"),
      ("no pii here", "no pii here"))
    val got = cases.map(_._1).toDF("t")
      .select(TextPrep.redact(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("text normalization lowercases, collapses whitespace and trims") {
    import spark.implicits._
    val docs = Seq((1L, "  Foo\tBAR\n\nbaz  ")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("norm")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val r = TextPrep.textNormalize(spark, tmp.toString).collect().head
    val norm = "foo bar baz"
    val fp = MessageDigest.getInstance("MD5").digest(norm.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getLong(1) === 16L) // raw length
    assert(r.getLong(2) === norm.length.toLong)
    assert(r.getString(3) === fp)
  }

  test("stratified sample membership is the pure md5-bucket function") {
    def bucketOf(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pct = Map("en" -> 25, "zh" -> 50, "es" -> 50, "de" -> 50)
    val expect = docs.filter { case (id, lang) =>
      bucketOf(id) < pct.getOrElse(lang, 100)
    }.map(_._1).toSet
    val got = TextPrep.stratifiedSampleQuery(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size < docs.length)
  }

  test("pii driver query finds exactly the injected identifiers") {
    val rows = TextPrep.piiRedact(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(1) === 1L, s"emails in doc ${r.getLong(0)}")
      assert(r.getLong(2) === 1L, s"ips in doc ${r.getLong(0)}")
      assert(r.getLong(3) === 1L, s"phones in doc ${r.getLong(0)}")
    }
  }
}
