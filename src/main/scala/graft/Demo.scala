package graft

import org.apache.spark.sql.SparkSession

import graft.schema.PatientSchema
import graft.search.PatientSearch

/** The reference's end-user surface: `demonstrate_system()`
  * (similarity_search.py:581-743) — setup → train → index → search →
  * formatted report. Run: `sbt "runMain graft.Demo [scale]"`, scale
  * divides the demo's 50k/40k/60k hospital sizes (default 100 → 500/400/600).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("=" * 90)
    println("PRIVACY-PRESERVING PATIENT SIMILARITY SEARCH WITH TRANSPLANT OUTCOMES (Spark)")
    println("=" * 90)

    val configs = Seq( // demo hospital_configs (similarity_search.py:592-596) / scale
      ("Hospital_A", 50000L / scale), ("Hospital_B", 40000L / scale), ("Hospital_C", 60000L / scale))
    val system = new PatientSearch(spark)

    println(s"\n1. Setting up ${configs.size} hospitals...")
    val patients = system.setupHospitals(configs)
    println(s"   ${patients.count()} patients generated")

    println("\n2. Running federated learning to train patient embedding model...")
    val losses = system.runFederatedTraining(rounds = 3, localEpochs = 5)
    println(s"   per-round mean Gram-loss: ${losses.map(l => f"$l%.4f").mkString(" -> ")}")

    println("\n3. Generating patient embeddings with transplant outcomes...")
    val index = system.generateAndStoreEmbeddings()
    println(s"   ${index.count()} embeddings stored")

    println("\n4. Searching similar patients for the demo query profile...")
    val result = system.searchSimilarPatients(PatientSchema.demoQueryPatient, topK = 5)
    println(s"Total patients searched across hospitals: ${result.totalSearched}")

    val stats = result.transplantStatistics.head()
    println("\n TRANSPLANT OUTCOME STATISTICS FOR SIMILAR PATIENTS:")
    println(s"   Total similar patients analyzed: ${stats.getAs[Long]("total_similar_patients")}")
    println(f"   Patients who received transplants: ${stats.getAs[Long]("transplanted_count")} " +
      f"(${stats.getAs[Double]("transplant_rate") * 100}%.1f%%)")
    println(s"   Patients who didn't receive transplants: ${stats.getAs[Long]("not_transplanted_count")}")
    if (stats.getAs[Long]("transplanted_count") > 0) {
      println(s"   • Successful transplants: ${stats.getAs[Long]("successful_transplants")}")
      println(f"   • Average wait time: ${stats.getAs[Double]("average_wait_time_days")}%.0f days " +
        f"(${stats.getAs[Double]("average_wait_time_months")}%.1f months)")
    }
    println(s"   • Still active on waitlist: ${stats.getAs[Long]("still_on_waitlist")}")
    println(s"   • Removed (too sick): ${stats.getAs[Long]("removed_too_sick")}")
    println(s"   • Removed (improved): ${stats.getAs[Long]("removed_improved")}")
    println(s"   • Deceased on waitlist: ${stats.getAs[Long]("deceased_on_waitlist")}")

    println("\nTOP 5 MOST SIMILAR PATIENTS WITH TRANSPLANT OUTCOMES:")
    println("-" * 90)
    result.topSimilarPatients.collect().foreach { p =>
      println(s"\nRank ${p.getAs[Int]("rank")}:")
      println(s"  Patient ID: ${p.getAs[String]("patient_id")}")
      println(s"  Hospital: ${p.getAs[String]("hospital")}")
      println(f"  Similarity Score: ${p.getAs[Double]("similarity")}%.4f")
      if (p.getAs[Boolean]("received_transplant")) {
        println(" TRANSPLANT STATUS: RECEIVED")
        println(s"     • Transplant Date: ${p.getAs[String]("transplant_date")}")
        println(f"     • Wait Time: ${p.getAs[Double]("days_to_transplant")}%.0f days")
        println(s"     • Success: ${if (p.getAs[Boolean]("transplant_success")) "Yes" else "No"}")
      } else {
        println(" TRANSPLANT STATUS: NOT RECEIVED")
        val status = PatientSchema.waitlistStatusLabels
          .getOrElse(p.getAs[Int]("waitlist_status"), "Unknown")
        println(s"     • Current Status: $status")
      }
    }

    val ins = result.clinicalInsights.head()
    println("\n" + "=" * 90)
    println("CLINICAL INSIGHTS FOR QUERY PATIENT:")
    println("=" * 90)
    Option(ins.getAs[java.lang.Double]("avg_wait_transplanted_days")).foreach { d =>
      println(f" Among similar patients who received transplants: avg wait $d%.0f days " +
        f"(${ins.getAs[Double]("avg_wait_transplanted_months")}%.1f months)")
    }
    Option(ins.getAs[java.lang.Double]("avg_age_success")).foreach { a =>
      println(f"   • Average age at transplant: $a%.1f years; " +
        f"avg MELD ${ins.getAs[Double]("avg_meld_success")}%.1f; " +
        f"diabetes prevalence ${ins.getAs[Double]("diabetes_rate_success") * 100}%.1f%%")
    }
    Option(ins.getAs[java.lang.Double]("avg_wait_not_transplanted_days")).foreach { d =>
      println(f" Among similar patients without transplants: avg waitlist time $d%.0f days; " +
        s"${ins.getAs[Long]("still_waiting")} still actively waiting")
    }
    spark.stop()
  }
}
