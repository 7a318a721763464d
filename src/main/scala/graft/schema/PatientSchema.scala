package graft.schema

import org.apache.spark.sql.types._

/** Single source of truth for the patient data model.
  *
  * The reference hard-codes the 20-feature order twice (training side
  * similarity_search.py:188-194, query side 565-571) and the metadata dict
  * schema inline (511-530); here both live in one object so they cannot
  * drift.
  */
object PatientSchema {

  /** Canonical feature order (similarity_search.py:188-194 == 565-571). */
  val featureCols: Seq[String] = Seq(
    "age", "meld_score", "bmi", "creatinine", "bilirubin", "inr",
    "sodium", "albumin", "dialysis", "ascites", "encephalopathy",
    "diabetes", "hypertension", "etiology_alcohol", "etiology_nash",
    "etiology_hcv", "etiology_other", "blood_type_o", "blood_type_a",
    "blood_type_b")

  val inputDim = 20
  val embeddingDim = 128
  val hiddenDims: Seq[Int] = Seq(256, 128)

  /** Metadata struct (similarity_search.py:511-530). The reference's
    * `'N/A'` date sentinel becomes a nullable DateType (SURVEY.md §1.2);
    * `coalesce(date_format(transplant_date,'yyyy-MM-dd'), 'N/A')`
    * reproduces the presentation form.
    */
  val metadataType: StructType = StructType(Seq(
    StructField("age", DoubleType, nullable = false),
    StructField("meld_score", DoubleType, nullable = false),
    StructField("bmi", DoubleType, nullable = false),
    StructField("hospital", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("received_transplant", BooleanType, nullable = false),
    StructField("transplant_success", BooleanType, nullable = false),
    StructField("days_to_transplant", DoubleType, nullable = false),
    StructField("transplant_date", DateType, nullable = true),
    StructField("follow_up_days", DoubleType, nullable = false),
    StructField("days_on_waitlist", DoubleType, nullable = false),
    StructField("waitlist_status", IntegerType, nullable = false),
    StructField("creatinine", DoubleType, nullable = false),
    StructField("bilirubin", DoubleType, nullable = false),
    StructField("dialysis", BooleanType, nullable = false),
    StructField("diabetes", BooleanType, nullable = false)))

  /** Waitlist status decode (similarity_search.py:690-695). */
  val waitlistStatusLabels: Map[Int, String] = Map(
    0 -> "Still active on waitlist",
    1 -> "Removed (too sick)",
    2 -> "Removed (condition improved)",
    3 -> "Deceased on waitlist")

  /** The demo's flagship query patient (similarity_search.py:613-634).
    * Missing keys default to 0 (similarity_search.py:573).
    */
  val demoQueryPatient: Map[String, Double] = Map(
    "age" -> 52, "meld_score" -> 22, "bmi" -> 28.5, "creatinine" -> 1.8,
    "bilirubin" -> 12.3, "inr" -> 2.1, "sodium" -> 135, "albumin" -> 2.8,
    "dialysis" -> 0, "ascites" -> 1, "encephalopathy" -> 1, "diabetes" -> 1,
    "hypertension" -> 1, "etiology_alcohol" -> 1, "etiology_nash" -> 0,
    "etiology_hcv" -> 0, "etiology_other" -> 0, "blood_type_o" -> 1,
    "blood_type_a" -> 0, "blood_type_b" -> 0)
}
