package graft.search

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** SQ8 scalar quantization: the per-element error bound that makes the
  * compressed path trustworthy, top-k fidelity vs the exact ranking, and
  * the serving plan shape.
  */
class QuantizedSearchSpec extends SparkSpec {

  test("dequantized elements are within half a quantization step of the raw values") {
    val emb = Tables.embeddings(spark, sfDir)
    val range = QuantizedSearch.elementRange(emb)
    val Array(mn, mx) = range.collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val step = (mx - mn) / 255.0
    val worst = QuantizedSearch.withDequantized(emb, range)
      .select(explode(zip_with(
        col("embedding").cast("array<double>"), col("dq"),
        (x, d) => abs(x - d))).as("err"))
      .agg(max(col("err"))).collect().head.getDouble(0)
    assert(worst <= step / 2 + 1e-12, s"worst=$worst step=$step")
  }

  test("sq top-10 recalls at least 8 of the exact top-10") {
    val sq = QuantizedSearch.sqTopK(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = VectorSearch.knnBrute(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((sq & exact).size >= 8, s"sq=$sq exact=$exact")
  }

  test("sq serve plans as TakeOrderedAndProject over a shuffle-free scan") {
    val plan = QuantizedSearch.sqTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
