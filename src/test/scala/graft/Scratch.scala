package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Ad-hoc oracle self-check harness (not a spec): dumps the named queries
  * (all oracle-bearing queries when no args) at every SF for
  * `scripts/check.py`, which mirrors the driver's DuckDB compare. Run:
  * `sbt "Test/runMain graft.Scratch q_ann_recall ..."`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val allNames: Seq[String] =
      if (args.nonEmpty) args.toSeq else SparkEntry.oracleSql.keys.toSeq.sorted
    // golden-value oracles are pinned to the driver's verify corpus
    // (sf0.01); checking them at other SFs is a guaranteed false FAIL
    val sf001Only = Set("q_ann_ivf", "q_ann_batch_ivf", "q_ann_neardup",
      "q_ann_pq", "q_ann_pq_rerank", "q_ann_ivfpq", "q_compression_recall",
      "q_bpe_merges", "q_bpe_tokenize")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val names =
        if (sf == "sf0.01") allNames else allNames.filterNot(sf001Only)
      val dir = s"/root/testdata/$sf"
      val out = s"/tmp/verify_scratch/$sf"
      new java.io.File(out).mkdirs()
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).coalesce(1)
          .write.mode("overwrite").parquet(s"$out/$n")
        println(f"SCRATCH $sf $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val json = names.filter(SparkEntry.oracleSql.contains)
        .map(n => s"${q(n)}: ${q(SparkEntry.oracleSql(n))}")
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
