package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` bucketed co-located join — the third leg of the big-join
  * toolkit next to broadcast ([[Relational]]'s dimension joins) and skew
  * salting ([[SkewJoin]]): when two FACT tables are repeatedly joined on
  * the same key, pre-bucketing both by that key into the same bucket
  * count makes every subsequent join exchange-free — each task reads
  * matching bucket files from both sides and merges locally. At 100 TB
  * that turns the recurring orders⋈lineitem shuffle (the dominant cost
  * of a fact-fact join) into a one-time layout cost amortized over every
  * downstream run — the standard warehouse layout decision this library
  * should make for its users' hot join keys.
  *
  * The bucketed tables are EXTERNAL (md5-keyed path under the system tmp
  * dir — the persisted-index pattern of [[AnnSearch]]), written once per
  * corpus per process; the QUERY path only reads them. Bucket count 8 is
  * corpus-sized; at real scale it is chosen so bucket_size ≈ one task's
  * comfortable input (e.g. 100 TB / 2¹⁵ buckets ≈ 3 GB).
  *
  * The spec pins the plan property that makes this worth shipping: the
  * executed join has NO hashpartitioning Exchange on either side — both
  * scans report their bucketing — and the result is bit-identical to the
  * plain (shuffled) join of the raw parquet.
  */
object BucketedJoin extends QueryPack {

  private val nBuckets = 8

  private def digestOf(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Ensure bucketed twins of orders/lineitem exist for `dir`; returns
    * their catalog table names. Layout build is a one-time offline job
    * (one shuffle of each table into its buckets); every query after it
    * joins without an exchange.
    *
    * Existence is keyed off the SESSION's catalog, not a JVM-wide memo: a
    * process can host several sequential SparkSessions (Bench runs the
    * local[32] and contract local[4] configs back-to-back), and each new
    * session starts with a fresh in-memory catalog — a static memo would
    * claim "built" while `s.table(name)` throws TABLE_OR_VIEW_NOT_FOUND.
    * Rebuilding per session costs one extra layout shuffle, which is the
    * correct trade for a layout whose metadata lives in the catalog.
    */
  private[graft] def ensureBucketed(s: SparkSession, dir: String): (String, String) =
    synchronized {
      val digest = digestOf(dir)
      val root = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_bucketed_$digest")
      val ot = s"graft_orders_b_$digest"
      val lt = s"graft_lineitem_b_$digest"
      if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(lt)) {
        Tables.orders(s, dir).write
          .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
          .option("path", root.resolve("orders").toString)
          .mode("overwrite").saveAsTable(ot)
        Tables.lineitem(s, dir).write
          .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
          .option("path", root.resolve("lineitem").toString)
          .mode("overwrite").saveAsTable(lt)
      }
      (ot, lt)
    }

  /** Per-priority revenue over the bucketed orders⋈lineitem join. The
    * `merge` hint pins the sort-merge strategy so the spec's
    * exchange-free property is about BUCKETING, not about AQE choosing a
    * broadcast at toy scale (at fact-fact scale there is no broadcast to
    * choose). Decimal-exact money math, terminal double cast (§5 rules).
    */
  def bucketJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensureBucketed(s, dir)
    s.table(lt).hint("merge")
      .join(s.table(ot).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_bucket_join" -> (bucketJoinQuery _))

  /** Bucketing is a pure LAYOUT change: the oracle is the plain join on
    * the raw parquet tables.
    */
  override def oracleSql: Map[String, String] = Map(
    "q_bucket_join" ->
      """SELECT o.o_orderpriority,
        |  count(*) AS n_items,
        |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin)
}
