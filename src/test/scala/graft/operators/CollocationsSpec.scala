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
}
