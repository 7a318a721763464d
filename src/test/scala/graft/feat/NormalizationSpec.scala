package graft.feat

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gen.PatientGenerator
import graft.schema.PatientSchema

class NormalizationSpec extends SparkSpec {

  test("zscore gives mean≈0, population std≈1 per column") {
    val df = PatientGenerator.patients(spark, 2000, "H", 42)
    val z = Normalization.zscore(df, Seq("age", "meld_score", "bmi"))
    val r = z.agg(avg("age"), stddev_pop("age"), avg("bmi"), stddev_pop("bmi")).head()
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-4) // +1e-8 denominator skews slightly
    assert(math.abs(r.getDouble(2)) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-4)
  }

  test("per-group zscore normalizes within each hospital (similarity_search.py:180)") {
    val df = PatientGenerator.setupHospitals(spark,
      Seq(("A", 1000L), ("B", 1000L)), seed = 42)
    val z = Normalization.zscore(df, Seq("age"), perGroup = Some("hospital"))
    val rows = z.groupBy("hospital").agg(avg("age"), stddev_pop("age"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-9, s"${r.getString(0)} mean")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-4, s"${r.getString(0)} std")
    }
  }

  test("assembleFeatures builds the canonical 20-float array in order") {
    val df = PatientGenerator.patients(spark, 10, "H", 42)
    val row = Normalization.assembleFeatures(df)
      .select("features", "age", "blood_type_b").head()
    val arr = row.getSeq[Float](0)
    assert(arr.length == PatientSchema.inputDim)
    assert(math.abs(arr.head - row.getDouble(1).toFloat) < 1e-6) // age first
    assert(arr.last == row.getInt(2).toFloat) // blood_type_b last
  }

  test("prepareQueryFeatures reproduces the per-ROW normalization quirk " +
    "(similarity_search.py:576 — different axis than training, by design)") {
    val v = Normalization.prepareQueryFeatures(Map("age" -> 10.0, "meld_score" -> 20.0))
    // raw = [10, 20, 0*18]; mean = 1.5; var = (72.25 + 342.25 + 18*2.25)/20 = 22.75
    val mean = 1.5
    val std = math.sqrt((math.pow(10 - mean, 2) + math.pow(20 - mean, 2) +
      18 * math.pow(0 - mean, 2)) / 20)
    assert(math.abs(v(0) - ((10 - mean) / (std + 1e-8)).toFloat) < 1e-6)
    assert(math.abs(v(1) - ((20 - mean) / (std + 1e-8)).toFloat) < 1e-6)
    // missing keys default to 0 (similarity_search.py:573)
    assert(v(2) == ((0 - mean) / (std + 1e-8)).toFloat)
    assert(v.length == 20)
  }
}
