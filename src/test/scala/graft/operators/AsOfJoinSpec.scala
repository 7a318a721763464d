package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfJoinSpec extends SparkSpec {

  test("single-pass (union-tag) as-of == compose (join+window) as-of") {
    val events = Tables.events(spark, sfDir).filter(col("user_id") < 50)
    val orders = Tables.orders(spark, sfDir)

    val composed = AsOfJoin.asofBackward(
      events, orders,
      on = (col("user_id"), col("o_custkey")),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      leftId = col("event_id"), tiebreak = col("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val singlePass = AsOfJoin.asofBackwardSinglePass(
      events, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      rightCols = Seq("o_orderkey", "o_orderdate"),
      tiebreak = col("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(composed.nonEmpty)
    assert(singlePass == composed)
  }

  test("as-of picks the latest right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 50L), (3L, 10L))
      .toDF("l_id", "l_t").withColumn("k", lit("a"))
    val right = Seq((10L, 20L), (11L, 50L), (12L, 80L))
      .toDF("r_id", "r_t").withColumn("k", lit("a"))
    val got = AsOfJoin.asofBackward(
      left, right.withColumnRenamed("k", "rk"),
      on = (col("k"), col("rk")),
      leftTime = col("l_t"), rightTime = col("r_t"),
      leftId = col("l_id"), tiebreak = col("r_id"))
      .select("l_id", "r_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // l_t=100 → r_t=80; l_t=50 → r_t=50 (inclusive); l_t=10 → no match
    assert(got == Map(1L -> 12L, 2L -> 11L))
  }

  test("left-outer as-of keeps unmatched left rows with null right side " +
    "and agrees with the inner as-of on matched rows") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 50L), (3L, 10L))
      .toDF("l_id", "l_t").withColumn("k", lit("a"))
    val right = Seq((10L, 20L), (11L, 50L), (12L, 80L))
      .toDF("r_id", "r_t").withColumn("k", lit("a"))
    val rows = AsOfJoin.asofBackwardOuter(
      left, right.withColumnRenamed("k", "rk"),
      on = (col("k"), col("rk")),
      leftTime = col("l_t"), rightTime = col("r_t"),
      leftId = col("l_id"), tiebreak = col("r_id"))
      .select("l_id", "r_id").collect()
    assert(rows.length == 3, "every left row survives")
    val got = rows.map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(12L), 2L -> Some(11L), 3L -> None))

    // on the corpus: outer ⊇ inner, and matched rows agree exactly
    val events = Tables.events(spark, sfDir).filter(col("user_id") < 50)
    val orders = Tables.orders(spark, sfDir)
    def run(outer: Boolean) = {
      val f = if (outer) AsOfJoin.asofBackwardOuter _ else AsOfJoin.asofBackward _
      f(events, orders, (col("user_id"), col("o_custkey")),
        col("ts"), col("o_orderdate"), col("event_id"), col("o_orderkey"))
        .select(col("event_id"), col("o_orderkey"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
    }
    val inner = run(outer = false)
    val outer = run(outer = true)
    assert(outer.size == events.count())
    assert(inner.forall { case (k, v) => outer(k) == v })
    assert((outer.keySet -- inner.keySet).forall(k => outer(k).isEmpty))
  }
}
