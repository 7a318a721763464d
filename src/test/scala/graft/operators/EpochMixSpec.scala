package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpochMixSpec extends SparkSpec {

  test("every doc emits floor(w) or ceil(w) copies, indexed 1..n") {
    val docs = graft.Tables.documents(spark, sfDir)
    val mix = EpochMix.epochMix(docs).cache()
    val perDoc = mix.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("n"), max(col("copy_idx")).as("mx"),
        min(col("copy_idx")).as("mn"),
        count_distinct(col("copy_idx")).as("nd"))
    val bad = perDoc.filter(
      col("n") =!= col("mx") || col("mn") =!= 1 || col("nd") =!= col("n") ||
        (col("n") =!= floor(col("w")).cast("long") &&
         col("n") =!= ceil(col("w")).cast("long")))
    assert(bad.count() === 0L)
    mix.unpersist()
  }

  test("weight below 1 actually downsamples; above 1 actually upsamples") {
    val docs = graft.Tables.documents(spark, sfDir)
    val mix = EpochMix.epochMix(docs).cache()
    val bySource = mix.groupBy(col("source"))
      .agg(count(lit(1)).as("out"), first(col("w")).as("w"))
      .join(docs.groupBy(col("source")).agg(count(lit(1)).as("in_")), "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    for ((src, out, w, in_) <- bySource) {
      assert(out >= math.floor(w).toLong * in_,
        s"$src emitted fewer than floor(w) copies per doc")
      assert(out <= math.ceil(w).toLong * in_,
        s"$src emitted more than ceil(w) copies per doc")
    }
    val src0 = bySource.find(_._1 == "src0").get
    assert(src0._2 < src0._4, "w=0.5 must drop some docs")
    mix.unpersist()
  }

  test("the mix is a pure function of ids: re-running gives the identical multiset") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = EpochMix.epochMix(docs).select("doc_id", "copy_idx")
    val b = EpochMix.epochMix(docs.repartition(7)).select("doc_id", "copy_idx")
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("plan shape: no shuffle before the explode (narrow materialization)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val plan = EpochMix.epochMix(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"epoch mix must be a narrow map+explode, got:\n$plan")
  }
}
