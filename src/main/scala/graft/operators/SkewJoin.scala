package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Manual key-salting for skewed equi-joins — the explicit form of what
  * AQE's skew-join optimization does adaptively. Still needed when (a) the
  * skewed side feeds a non-AQE-eligible shape (e.g. a pre-shuffled
  * bucketed table), or (b) skew is known a priori and you want
  * deterministic partition sizing at 100 TB rather than runtime
  * re-planning.
  *
  * Left rows scatter across `saltBuckets` sub-keys; the (small or
  * moderate) right side replicates `saltBuckets`×, so each hot key's rows
  * spread over `saltBuckets` reducers instead of one.
  */
object SkewJoin extends QueryPack {

  /** `joinHint` (e.g. Some("merge")) is applied to the replicated side AT
    * the join, where it reliably reaches the join node — salting exists
    * to fix a SHUFFLE join's reducer skew, so callers often need to hold
    * off auto-broadcast to exercise it.
    */
  def saltedEquiJoin(skewed: DataFrame, other: DataFrame, key: String,
                     saltBuckets: Int = 8,
                     joinHint: Option[String] = None): DataFrame = {
    require(saltBuckets > 0)
    val salted0 = skewed.withColumn("__salt",
      (rand(42) * saltBuckets).cast("int"))
    // the hint goes on BOTH sides: a broadcast hint landing on the
    // unhinted side (Spark's sizing or a stats rule) would outrank a
    // single-side merge hint and plan a broadcast join, making the
    // salt pure overhead
    val salted = joinHint.fold(salted0)(salted0.hint(_))
    val replicated0 = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    val replicated = joinHint.fold(replicated0)(replicated0.hint(_))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt parameterization FROM THE RANK SIDECAR — no hand tuning: a
    * KEY column's quantile summary exposes heavy hitters for free (a
    * value repeated r times owns ~r/s consecutive summary points, so
    * the summed weight of equal-valued points estimates its frequency
    * within the summary's rank budget). Salting is result-invariant
    * for ANY bucket count — correctness never rides this estimate —
    * the stats only SIZE it: buckets ≈ hottest key's rows / ideal
    * reducer share (n / shuffle partitions), clamped to `maxBuckets`.
    * Returns 1 (don't salt) when the hottest key stays within
    * `skewFactor`× a fair share, or when the sidecar is missing or
    * stale for the current version — a join that is not provably
    * skewed should not pay replication overhead.
    */
  def saltBucketsFor(spark: SparkSession, table: String, keyCol: String,
                     skewFactor: Double = 2.0, maxBuckets: Int = 64): Int = {
    import graft.sources.{RankStats, SnapshotTable}
    RankStats.readRanks(spark, table) match {
      case Some(rf)
        if rf.version == SnapshotTable.currentVersion(spark, table) =>
        val segs = rf.summaries.filter(s => s.col == keyCol && s.n > 0L)
        if (segs.isEmpty) 1
        else {
          val n = segs.map(_.n).sum
          // frequency per distinct summary value, segments summed — a
          // hot key split across delta segments still totals up
          val hottest = segs.flatMap(s => s.values.zip(s.weights))
            .groupBy(_._1).valuesIterator.map(_.map(_._2).sum).max
          // a platform may set shuffle.partitions non-numeric ("auto");
          // this helper's contract is to DECLINE, never to crash
          val parts = scala.util
            .Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
            .toOption.filter(_ > 0).getOrElse(return 1)
          val share = math.max(1.0, n.toDouble / parts)
          if (hottest <= skewFactor * share) 1
          else math.min(maxBuckets, math.ceil(hottest / share).toInt)
        }
      case _ => 1
    }
  }

  /** [[saltedEquiJoin]] with `saltBuckets` chosen by [[saltBucketsFor]]
    * from the skewed snapshot table's own rank sidecar: a provably-hot
    * key gets exactly the spread it needs, an even key distribution
    * (or absent stats) joins plain with zero added overhead.
    */
  def autoSaltedEquiJoin(spark: SparkSession, skewedTable: String,
                         other: DataFrame, key: String,
                         joinHint: Option[String] = None): DataFrame = {
    import graft.sources.SnapshotTable
    val buckets = saltBucketsFor(spark, skewedTable, key)
    val skewed = SnapshotTable.read(spark, skewedTable)
    if (buckets <= 1) {
      val o = joinHint.fold(other)(other.hint(_))
      skewed.join(o, Seq(key))
    } else saltedEquiJoin(skewed, other, key, buckets, joinHint)
  }

  /** Driver-visible salted join over a DELIBERATELY skewed key: 75% of
    * orders are rerouted to customer 1 (the power-law hot key every real
    * corpus has somewhere), then joined to `customer` salted. The salt
    * values come from `rand` but CANNOT affect the result — the right
    * side carries every salt for every key, so salting only re-buckets
    * the shuffle — which is exactly why the query is DuckDB-oracle-
    * checkable against the plain (unsalted) join. The `merge` hint keeps
    * the join a shuffle join (a broadcast of the tiny dim would bypass
    * the skewed exchange this query exists to exercise);
    * SkewJoinSpec asserts the salt actually lands in the shuffle keys
    * and that salted ≡ plain.
    */
  def skewJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .withColumn("hot_cust",
        when(col("o_orderkey") % 4 < 3, lit(1L)).otherwise(col("o_custkey")))
    val customer = Tables.customer(s, dir)
      .select(col("c_custkey").as("hot_cust"), col("c_mktsegment"))
    saltedEquiJoin(orders, customer, "hot_cust", joinHint = Some("merge"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy(col("c_mktsegment"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_skew_join" -> (skewJoinQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_skew_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer
        |  ON (CASE WHEN o_orderkey % 4 < 3 THEN 1 ELSE o_custkey END) = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
}
