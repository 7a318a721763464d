package graft.operators

import graft.SparkSpec

/** PMI collocations checked against an independent scalar recompute from
  * the raw corpus text.
  */
class CollocationsSpec extends SparkSpec {

  test("top-20 PMI collocations match a scalar recompute") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val bi = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    var nu = 0L; var nb = 0L
    for (t <- texts) {
      val w = t.split(" ")
      w.foreach { x => uni(x) += 1; nu += 1 }
      w.sliding(2).filter(_.length == 2).foreach { p =>
        bi((p(0), p(1))) += 1; nb += 1
      }
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = bi.toSeq
      .filter(_._2 >= 5)
      .map { case ((a, b), c) =>
        (a, b, c, r6(math.log((c.toDouble / nb) /
          ((uni(a).toDouble / nu) * (uni(b).toDouble / nu)))))
      }
      .sortBy { case (a, b, _, pmi) => (-pmi, a, b) }
      .take(20)

    val got = TextAnalysis.collocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("chunking tiles every document: stride-spaced starts, full coverage, " +
    "fingerprints match the recomputed chunk text") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val chunks = TextAnalysis.chunkDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet)
    for ((id, cs) <- chunks) {
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 0L)
      assert(sorted.map(_._3).toSeq ===
        sorted.indices.map(_ * 48L), s"stride spacing for doc $id")
      val n = docs(id).length
      val last = sorted.last
      assert(last._3 + last._4 === n.toLong, s"coverage for doc $id")
      for ((_, _, start, nTok, fp) <- sorted) {
        val text = docs(id).slice(start.toInt, start.toInt + nTok.toInt).mkString(" ")
        val want = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(fp === want, s"fingerprint for doc $id chunk at $start")
      }
    }
  }
}
