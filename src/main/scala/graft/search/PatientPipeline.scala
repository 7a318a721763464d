package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.schema.PatientSchema

/** Driver-contract surface for the reference-parity pipeline (generate →
  * normalize → federated-train → index → search → stats). Not
  * DuckDB-expressible (trained embeddings), so these are rows-only checks;
  * invariants are scalatest-verified in PatientSearchSpec.
  *
  * The corpus here is intentionally small (the driver runs these every
  * round); scale comes from the config, not the code — the same plan runs
  * the reference's 150k demo or 150B rows.
  */
object PatientPipeline extends QueryPack {

  private val configs = Seq(("Hospital_A", 300L), ("Hospital_B", 240L), ("Hospital_C", 360L))

  // one trained system per JVM (Verify and Bench each run several of these
  // queries; training twice would double their runtime for no information)
  @volatile private var memo: Option[(SparkSession, PatientSearch.Result, PatientSearch)] = None

  private def system(s: SparkSession): (PatientSearch.Result, PatientSearch) =
    memo match {
      case Some((sess, r, ps)) if sess eq s => (r, ps)
      case _ => synchronized {
        memo match {
          case Some((sess, r, ps)) if sess eq s => (r, ps)
          case _ =>
            val ps = new PatientSearch(s)
            ps.setupHospitals(configs)
            ps.runFederatedTraining(rounds = 1, localEpochs = 2)
            ps.generateAndStoreEmbeddings()
            val r = ps.searchSimilarPatients(PatientSchema.demoQueryPatient, topK = 5)
            memo = Some((s, r, ps))
            (r, ps)
        }
      }
    }

  /** Top-k hits for the demo query patient (metadata struct dropped for a
    * stable flat parquet schema).
    */
  def searchHits(s: SparkSession, dir: String): DataFrame =
    system(s)._1.topSimilarPatients.drop("metadata")

  /** A3 statistics block. */
  def stats(s: SparkSession, dir: String): DataFrame =
    system(s)._1.transplantStatistics

  /** A6 clinical insights. */
  def insights(s: SparkSession, dir: String): DataFrame =
    system(s)._1.clinicalInsights

  /** ALWAYS-COLD end-to-end pipeline: trains a deliberately tiny fresh
    * system on every call (no memo), so the bench always carries one
    * non-memoized generate→normalize→train→index→search number instead
    * of relying on a SCALE.md footnote staying current. Budgeted small
    * (110 patients, 1 round × 1 epoch ≈ 2-3 s); the memoized system
    * above measures steady-state serving, this one measures cold start.
    */
  def coldSearch(s: SparkSession, dir: String): DataFrame = {
    val ps = new PatientSearch(s)
    ps.setupHospitals(Seq(("Cold_A", 60L), ("Cold_B", 50L)))
    ps.runFederatedTraining(rounds = 1, localEpochs = 1)
    ps.generateAndStoreEmbeddings()
    ps.searchSimilarPatients(PatientSchema.demoQueryPatient, topK = 5)
      .topSimilarPatients.drop("metadata")
  }

  /** Generator sanity summary (seeded column-expression generation).
    * Deterministic across cluster sizes because [[graft.gen.PatientGenerator]]
    * pins the range partitioning, so the oracle is a golden-value SELECT:
    * any drift in the seeded distributions (or a partitioning change that
    * would silently reshuffle every seeded draw) fails the hash gate.
    */
  def generatorSummary(s: SparkSession, dir: String): DataFrame =
    graft.gen.PatientGenerator.patients(s, 2000, "H_summary", 42)
      .groupBy(col("received_transplant").cast("bigint").as("received_transplant"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("age")), 2).as("avg_age"),
        round(avg(col("meld_score")), 2).as("avg_meld"),
        round(avg(col("days_to_transplant")), 2).as("avg_days_to_transplant"),
        round(avg(col("days_on_waitlist")), 2).as("avg_days_on_waitlist"))
      .orderBy(col("received_transplant"))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_patient_search"   -> (searchHits _),
    "q_patient_stats"    -> (stats _),
    "q_patient_insights" -> (insights _),
    "q_patient_cold"     -> (coldSearch _),
    "q_patient_gen"      -> (generatorSummary _))

  /** Search/stats/insights (and the cold-path run) depend on trained
    * float weights (parallel
    * z-score and Adam sums are merge-order sensitive), so they stay
    * rows-only. The GENERATOR summary is bit-deterministic (pinned range
    * partitioning + per-column seeds + 2-decimal rounding), so its oracle
    * is golden values captured from the pinned stream — verified
    * identical on local[4] and local[32].
    */
  override def oracleSql: Map[String, String] = Map(
    "q_patient_gen" ->
      """SELECT CAST(0 AS BIGINT) AS received_transplant, CAST(1246 AS BIGINT) AS n,
        |  CAST(54.35 AS DOUBLE) AS avg_age, CAST(13.02 AS DOUBLE) AS avg_meld,
        |  CAST(0.0 AS DOUBLE) AS avg_days_to_transplant,
        |  CAST(204.32 AS DOUBLE) AS avg_days_on_waitlist
        |UNION ALL
        |SELECT 1, 754, 54.72, 18.87, 121.01, 0.0
        |ORDER BY received_transplant""".stripMargin)
}
