package graft
import org.apache.spark.sql.SparkSession

/** Per-round plan audit: exchange/broadcast/cartesian/Expand counts for
  * the newest driver queries — run after adding operators, cite in
  * SCALE.md (the round-7 numbers are recorded there).
  */
object PlanAudit7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_leakage_split", "q_training_manifest", "q_global_shuffle",
        "q_epoch_mix", "q_incr_moments", "q_zipf_slope", "q_ks_drift")) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      val cart = "Cartesian".r.findAllIn(plan).length
      val expand = "Expand".r.findAllIn(plan).length
      println(f"PLAN $name%-22s exchanges=${ex - bc}%2d broadcasts=$bc%2d cartesian=$cart expand=$expand")
    }
    spark.stop()
  }
}
