package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Shared housekeeping for the streaming drivers — bounds the on-disk and
  * in-catalog litter a long-lived session would otherwise accumulate:
  *
  *  - per-run CHECKPOINT dirs (unavoidably fresh: reusing one would make a
  *    re-run a no-op replay) all live under one process-scoped root that a
  *    shutdown hook removes;
  *  - STAGING dirs are fixed per key (md5 of the source path), so repeated
  *    runs reuse one dir per corpus — and a checkpointed query restarted
  *    against the "same" source sees the same basePath across processes;
  *  - each driver run DROPS its predecessor's memory-sink table for the
  *    same (sink kind, corpus), keeping at most one live catalog entry per
  *    pair.
  */
private[streaming] object StreamHousekeeping {

  private lazy val ckRoot: Path = {
    val root = Files.createTempDirectory("graft_stream_ck")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
          Files.list(p).toArray.foreach(c => rm(c.asInstanceOf[Path]))
        Files.deleteIfExists(p)
      }
      rm(root)
    }))
    root
  }

  def freshCheckpointDir(): String =
    Files.createTempDirectory(ckRoot, "run").toString

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Fixed, creation-idempotent staging dir for `key` under the system
    * tmp dir. The caller owns the contents contract (what to stage, when
    * stale) — see [[DocDedupStream.stagedDir]] for the re-stage check.
    */
  def fixedStagingDir(prefix: String, key: String): Path =
    Paths.get(System.getProperty("java.io.tmpdir"), s"$prefix${md5Hex(key)}")

  private val lastSink = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register `name` as the live memory-sink table for (kind, corpus),
    * dropping the previous run's table if one exists.
    */
  def trackSink(spark: SparkSession, kind: String, dir: String, name: String): Unit =
    Option(lastSink.put(s"$kind:$dir", name))
      .foreach(prev => spark.catalog.dropTempView(prev))
}
