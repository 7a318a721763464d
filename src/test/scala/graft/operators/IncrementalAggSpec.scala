package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IncrementalAggSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[(String, Long, Double, Double, Double, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

  test("merged view equals the direct aggregation at any split point") {
    val orders = Tables.orders(spark, sfDir)
    val direct = rows(IncrementalAgg.finalize(IncrementalAgg.partialAgg(orders)))
    for (cut <- Seq("1993-06-01", "1996-01-01", "1998-01-01", "2010-01-01")) {
      val base = orders.filter(col("o_orderdate") < lit(cut))
      val delta = orders.filter(col("o_orderdate") >= lit(cut))
      val merged = rows(IncrementalAgg.finalize(
        IncrementalAgg.merge(
          IncrementalAgg.partialAgg(base), IncrementalAgg.partialAgg(delta))))
      assert(merged === direct, s"split at $cut")
    }
  }

  test("merge is associative across a three-way split") {
    val orders = Tables.orders(spark, sfDir)
    val a = IncrementalAgg.partialAgg(orders.filter(col("o_orderkey") % 3 === 0))
    val b = IncrementalAgg.partialAgg(orders.filter(col("o_orderkey") % 3 === 1))
    val c = IncrementalAgg.partialAgg(orders.filter(col("o_orderkey") % 3 === 2))
    val left = rows(IncrementalAgg.finalize(
      IncrementalAgg.merge(IncrementalAgg.merge(a, b), c)))
    val right = rows(IncrementalAgg.finalize(
      IncrementalAgg.merge(a, IncrementalAgg.merge(b, c))))
    assert(left === right)
    assert(left === rows(IncrementalAgg.finalize(IncrementalAgg.partialAgg(orders))))
  }
}
