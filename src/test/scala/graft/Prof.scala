package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Job/stage/task profiler for one SparkEntry query: warmup + timed pass,
  * reporting job count, stage count, task count, total task time.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        stageLog.add((s.stageInfo.name.takeWhile(_ != '\n').take(90), s.stageInfo.numTasks, s.stageInfo.taskMetrics.executorRunTime))
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warmup (fixtures memoize)
    Thread.sleep(500)
    jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"PROF $name wall=$wall%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskSec=${taskMs.get / 1e3}%.1f")
    import scala.jdk.CollectionConverters._
    stageLog.asScala.toSeq.groupBy(_._1).map { case (n, xs) =>
      (n, xs.size, xs.map(_._2).sum, xs.map(_._3).sum) }.toSeq
      .sortBy(-_._4).take(20).foreach { case (n, c, t, ms) =>
        println(f"STAGE ${ms / 1e3}%8.2fs n=$c%-4d tasks=$t%-5d $n") }
    spark.stop()
  }
}
