package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join on skewed data, hot key spread over salts") {
    // 90% of left rows share one hot key
    val left = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 100).otherwise(lit(7L)).as("k"),
        $"id".as("v"))
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", saltBuckets = 8)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)

    // replication factor is exactly saltBuckets on the dim side
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(7))))
    assert(replicated.count() == right.count() * 8)

    // the hot key's rows really scatter across multiple salt values
    val saltsUsed = left.withColumn("__salt", (rand(42) * 8).cast("int"))
      .filter($"k" === 7).select("__salt").distinct().count()
    assert(saltsUsed > 4)
  }

  test("auto-salt from the rank sidecar: a provably hot key sizes its " +
    "buckets from stats alone, an even key declines to salt, a stale " +
    "sidecar declines, and the auto-salted join equals the plain join") {
    import graft.sources.{RankStats, SnapshotTable}
    def freshDir() = java.nio.file.Files
      .createTempDirectory("autosalt").resolve("t").toString
    // 90% of rows share key 7 — the power-law hot key
    val skewT = freshDir()
    SnapshotTable.create(spark, skewT,
      spark.range(10000).select(
        when($"id" % 10 === 0, $"id" % 100).otherwise(lit(7L)).as("k"),
        $"id".as("v"), lit("all").as("p")), "p")
    // before ANALYZE: no stats, no salting (never guess)
    assert(SkewJoin.saltBucketsFor(spark, skewT, "k") === 1)
    RankStats.analyze(spark, skewT, Seq("k"), m = 256)
    val buckets = SkewJoin.saltBucketsFor(spark, skewT, "k")
    // hottest ~9000 of 10000 rows vs share 10000/4 = 2500: expect ~4
    assert(buckets > 1 && buckets <= 8,
      s"stats must size the salt for a 90% hot key, got $buckets")
    // even distribution declines
    val evenT = freshDir()
    SnapshotTable.create(spark, evenT,
      spark.range(10000).select(($"id" % 100).as("k"),
        $"id".as("v"), lit("all").as("p")), "p")
    RankStats.analyze(spark, evenT, Seq("k"), m = 256)
    assert(SkewJoin.saltBucketsFor(spark, evenT, "k") === 1,
      "an even key distribution must not pay salting overhead")
    // stale sidecar declines (the estimate describes the wrong rows)
    SnapshotTable.commitAppend(spark, skewT,
      Seq((7L, -1L, "all")).toDF("k", "v", "p"), "p")
    assert(SkewJoin.saltBucketsFor(spark, skewT, "k") === 1)
    RankStats.refresh(spark, skewT)
    assert(SkewJoin.saltBucketsFor(spark, skewT, "k") > 1,
      "a delta-refreshed sidecar re-arms the estimate")
    // result parity: auto-salted == plain join
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val auto = SkewJoin.autoSaltedEquiJoin(spark, skewT, right, "k",
      joinHint = Some("merge")).select("k", "v", "name")
    val plain = SnapshotTable.read(spark, skewT).join(right, "k")
      .select("k", "v", "name")
    assert(auto.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(auto).count() === 0L)
    // and the auto plan really salts its shuffle keys
    val planStr = auto.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(planStr.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("__salt")),
      s"__salt must reach the shuffle keys:\n$planStr")
  }

  test("q_skew_join: the salt lands in the shuffle keys (shuffle join, " +
    "not broadcast) and salted ≡ plain join result") {
    val df = SkewJoin.skewJoinQuery(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // plan audit on the FINAL adaptive plan: the join must stay a shuffle
    // join (the merge hint held off auto-broadcast) and its exchanges must
    // hash on (hot_cust, __salt) — the hot key spread over salt buckets
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("SortMergeJoin") || finalPlan.contains("ShuffledHashJoin"),
      s"salted join must shuffle, not broadcast:\n$finalPlan")
    val saltedExchange = finalPlan.linesIterator
      .exists(l => l.contains("hashpartitioning") && l.contains("__salt"))
    assert(saltedExchange, s"__salt must appear in the shuffle keys:\n$finalPlan")

    // result equivalence with the plain (unsalted) join
    val orders = graft.Tables.orders(spark, sfDir)
      .withColumn("hot_cust",
        when(col("o_orderkey") % 4 < 3, lit(1L)).otherwise(col("o_custkey")))
    val customer = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("hot_cust"), col("c_mktsegment"))
    val plain = orders.join(customer, "hot_cust")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy(col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == plain)
  }
}
