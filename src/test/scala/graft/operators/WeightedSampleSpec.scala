package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Efraimidis–Spirakis weighted sampling: membership is the pure
  * −ln(u)/w bottom-k recomputed row-by-row, and weights actually bias
  * selection (heavier docs over-represented vs a uniform draw).
  */
class WeightedSampleSpec extends SparkSpec {

  private def md5U(id: Long): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ws1:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
  }

  test("bottom-k membership matches a scalar recompute of the ES keys") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = docs
      .map { case (id, w) => (id, w, r9(-math.log(md5U(id)) / w)) }
      .sortBy(t => (t._3, t._1)).take(20).toSeq
    val got = TextPrep.weightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect)
  }

  test("selection is weight-biased: sampled docs are longer than average") {
    val all = Tables.documents(spark, sfDir)
      .agg(avg(size(split(col("text"), " ")))).head().getDouble(0)
    val sampled = TextPrep.weightedSample(spark, sfDir, k = 50)
      .agg(avg(col("n_tokens"))).head().getDouble(0)
    assert(sampled > all,
      s"weighted sample mean $sampled should exceed corpus mean $all")
  }
}
