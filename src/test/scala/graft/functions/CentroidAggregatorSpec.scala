package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CentroidAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("centroid of known vectors (DataFrame udaf path)") {
    val df = Seq(
      ("a", Seq(1f, 2f)), ("a", Seq(3f, 4f)), ("b", Seq(10f, 20f)))
      .toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(CentroidAggregator.asUdf($"v").as("centroid"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(got("a") == Seq(2f, 3f))
    assert(got("b") == Seq(10f, 20f))
  }

  test("typed Dataset path: groupByKey + toColumn") {
    val ds = Seq(("a", Seq(1f, 3f)), ("a", Seq(3f, 5f))).toDS()
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(CentroidAggregator.toColumn)
      .collect().toMap
    assert(got("a") == Seq(2f, 4f))
  }

  test("per-label centroids on the embeddings corpus match avg-of-explode") {
    val e = Tables.embeddings(spark, sfDir)
    val viaAgg = e.groupBy($"label")
      .agg(CentroidAggregator.asUdf($"embedding").as("c"))
      .select($"label", element_at($"c", 1).as("c0"))
      .collect().map(r => r.getInt(0) -> r.getFloat(1)).toMap
    val viaExplode = e
      .select($"label", element_at($"embedding", 1).cast("double").as("e0"))
      .groupBy($"label").agg(avg($"e0").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    viaAgg.foreach { case (l, c0) =>
      assert(math.abs(c0 - viaExplode(l)) < 1e-6, s"label $l")
    }
  }
}
