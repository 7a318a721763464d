package graft.gen

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.PatientSchema

class PatientGeneratorSpec extends SparkSpec {

  private lazy val df = PatientGenerator.patients(spark, 5000, "H_test", 42).cache()

  test("generates the full schema: 20 features + id + outcomes + hospital") {
    val cols = df.columns.toSet
    PatientSchema.featureCols.foreach(c => assert(cols.contains(c), c))
    Seq("patient_id", "received_transplant", "days_to_transplant",
      "transplant_success", "transplant_date", "follow_up_days",
      "days_on_waitlist", "waitlist_status", "hospital")
      .foreach(c => assert(cols.contains(c), c))
  }

  test("clip bounds hold (similarity_search.py:60-67)") {
    val bounds = Seq(
      ("age", 18.0, 80.0), ("meld_score", 6.0, 40.0), ("bmi", 18.0, 45.0),
      ("creatinine", 0.5, 8.0), ("bilirubin", 0.3, 50.0), ("inr", 0.8, 6.0),
      ("sodium", 125.0, 150.0), ("albumin", 1.5, 5.0))
    val aggs = bounds.map { case (c, _, _) => min(col(c)).as(s"min_$c") } ++
      bounds.map { case (c, _, _) => max(col(c)).as(s"max_$c") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    bounds.zipWithIndex.foreach { case ((c, lo, hi), i) =>
      assert(row.getDouble(i) >= lo, s"$c min")
      assert(row.getDouble(i + bounds.length) <= hi, s"$c max")
    }
  }

  test("distribution centers are plausible (behavioral, not bit parity)") {
    val r = df.agg(avg("age"), avg("meld_score"), avg("dialysis"), avg("ascites"),
      avg("received_transplant")).head()
    assert(math.abs(r.getDouble(0) - 55) < 2, "age mean")
    // exponential(15) clipped to [6,40] pulls the mean up from 15
    assert(r.getDouble(1) > 12 && r.getDouble(1) < 25, "meld mean")
    assert(math.abs(r.getDouble(2) - 0.15) < 0.03, "dialysis rate")
    assert(math.abs(r.getDouble(3) - 0.40) < 0.03, "ascites rate")
    // base 0.25 + meld/age adjustments keeps overall rate in a sane band
    assert(r.getDouble(4) > 0.2 && r.getDouble(4) < 0.7, "transplant rate")
  }

  test("conditional zeroing partitions outcomes (similarity_search.py:114-163)") {
    assert(df.filter(col("received_transplant") === 0 &&
      (col("days_to_transplant") =!= 0 || col("follow_up_days") =!= 0 ||
        col("transplant_success") =!= 0 || col("transplant_date").isNotNull)).count() == 0)
    assert(df.filter(col("received_transplant") === 1 &&
      (col("days_on_waitlist") =!= 0 || col("waitlist_status") =!= 0 ||
        col("transplant_date").isNull)).count() == 0)
    // transplanted rows carry valid conditional fields
    assert(df.filter(col("received_transplant") === 1 &&
      (col("days_to_transplant") < 1 || col("days_to_transplant") > 1000)).count() == 0)
  }

  test("waitlist status only takes values 0-3 with 0 dominant") {
    val statuses = df.filter(col("received_transplant") === 0)
      .groupBy("waitlist_status").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(statuses.keySet.subsetOf(Set(0, 1, 2, 3)))
    assert(statuses(0) > statuses(1) && statuses(1) > statuses(3))
  }

  test("generation is seed-deterministic and distributed (no driver loop)") {
    val a = PatientGenerator.patients(spark, 100, "H", 7)
    val b = PatientGenerator.patients(spark, 100, "H", 7)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val c = PatientGenerator.patients(spark, 100, "H", 8)
    assert(c.exceptAll(a).count() > 0)
  }

  test("patient ids follow PT_%06d (similarity_search.py:83)") {
    val ids = df.select("patient_id").limit(3).collect().map(_.getString(0))
    assert(ids.forall(_.matches("PT_\\d{6}")))
  }
}
