package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 plan audit at sf0.1: (a) the record-level index plans only
  * its posting files for point lookups; (b) the index-driven join
  * plans only the dim-relevant fact files with the keys never
  * collected; (c) a pipeline refresh rewrites only the window's
  * affected files of the transform table. Cite in SCALE.md.
  */
object PlanAudit12 {
  private def withFileGranularity[T](s: SparkSession, bytes: Long)(body: => T): T = {
    val key = "spark.graft.write.targetFileBytes"
    val prev = s.conf.getOption(key)
    s.conf.set(key, bytes.toString)
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = graft.sources.SnapshotTable
    val six = graft.sources.SecondaryIndex

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def files(df: DataFrame): Long = {
      df.collect()
      def go(p: SparkPlan): Long = {
        val self = p match {
          case s: FileSourceScanExec => s.metrics("numFiles").value
          case _ => 0L
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec        => Seq(q.plan)
          case r: ReusedExchangeExec    => Seq(r.child)
          case other                    => other.children
        }
        self + kids.map(go).sum
      }
      go(df.queryExecution.executedPlan)
    }

    // ---- (a) point lookup through the record index
    val base = java.nio.file.Files.createTempDirectory("audit12")
    val t = base.resolve("orders").toString
    withFileGranularity(spark, 1L << 20) {
      st.create(spark, t, Tables.orders(spark, dir).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
        "o_orderpriority")
    }
    val idx = t + "_idx"
    six.create(spark, t, "o_orderkey", idx, buckets = 16)
    val total = st.readManifest(spark, t,
      st.currentVersion(spark, t)).size
    val keys = Seq(7L, 13L, 101L, 388L, 555L, 999L)
    val postings = six.lookupFiles(spark, t, "o_orderkey", idx, keys).get
    val scanned = files(six.read(spark, t, "o_orderkey", idx, keys,
      autoRefresh = false))
    val idxFiles = st.readManifest(spark, idx,
      st.currentVersion(spark, idx))
    println(s"[audit12] secidx-lookup tableFiles=$total " +
      s"postingFiles=${postings.size} plannedFiles=$scanned " +
      s"idxFiles=${idxFiles.size} idxRows=${idxFiles.map(_.rows).sum}")

    // ---- (b) index-driven join: distributed probe, no key collect
    val dim = Tables.lineitem(spark, dir).filter(col("l_quantity") === 50.0)
      .select(col("l_orderkey")).distinct()
    val nDim = dim.count()
    val joined = six.innerJoinPruned(spark, t, "o_orderkey", idx,
      dim, "l_orderkey", autoRefresh = false)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val factScanned = files(joined) // fact posting files + the dim scan
    println(s"[audit12] secidx-join dimKeys=$nDim tableFiles=$total " +
      s"scannedFiles(fact+dim)=$factScanned")

    // ---- (c) pipeline refresh rewrites only affected transform files
    val root = base.resolve("pipe").toString
    val src = s"$root/src"
    withFileGranularity(spark, 1L << 20) {
      st.create(spark, src, Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority")), "o_orderpriority")
    }
    val pipe = graft.sources.Pipeline(Seq(
      graft.sources.Pipeline.Source("src", src),
      graft.sources.Pipeline.Transform("t", s"$root/t", "src",
        "o_orderpriority", df => df.filter(col("o_totalprice") > 50000.0),
        key = Some("o_orderkey")),
      graft.sources.Pipeline.Agg("a", s"$root/a", "t",
        "o_orderpriority", "o_totalprice")))
    withFileGranularity(spark, 1L << 20) {
      pipe.init(spark)
    }
    val beforeT = st.readManifest(spark, s"$root/t",
      st.currentVersion(spark, s"$root/t")).map(_.path).toSet
    // a narrow update window: 1-URGENT keys in one key stripe
    val cur = st.read(spark, src)
    st.commitMerge(spark, src, cur
      .filter(col("o_orderkey") % 997 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100000.0),
      "o_orderkey", "o_orderpriority")
    val actions = pipe.refresh(spark).map(r => s"${r.node}:${r.action}")
    val afterT = st.readManifest(spark, s"$root/t",
      st.currentVersion(spark, s"$root/t")).map(_.path).toSet
    println(s"[audit12] pipeline actions=${actions.mkString(",")} " +
      s"tFilesBefore=${beforeT.size} tFilesAfter=${afterT.size} " +
      s"carried=${(beforeT intersect afterT).size} " +
      s"rewrittenOrNew=${(afterT diff beforeT).size}")
    spark.stop()
  }
}
