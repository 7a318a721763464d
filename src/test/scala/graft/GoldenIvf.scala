package graft

import org.apache.spark.sql.SparkSession

/** Determinism probe + golden capture for the IVF queries: runs
  * q_ann_ivf / q_ann_batch_ivf at sf0.01 under the given master and
  * shuffle-partition count in a FRESH JVM and prints the rows. Used to
  * assert the served results are bit-identical across cluster widths
  * before pinning them as golden-value oracles. Run:
  * `sbt "Test/runMain graft.GoldenIvf local[4] 4"`.
  */
object GoldenIvf {
  def main(args: Array[String]): Unit = {
    val master = if (args.nonEmpty) args(0) else "local[32]"
    val sp = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names =
      if (args.length > 2) args.drop(2).toSeq else Seq("q_ann_ivf", "q_ann_batch_ivf")
    for (q <- names) {
      SparkEntry.queries(q)(spark, dir).collect().foreach { r =>
        println(s"GOLDEN $q " + (0 until r.length).map(r.get(_).toString).mkString("|"))
      }
    }
    spark.stop()
  }
}
