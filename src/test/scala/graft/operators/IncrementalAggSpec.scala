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

  private def mrows(df: DataFrame): Seq[(String, Long, Double, Double, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))).toSeq

  test("moments state merges to the direct computation at any split, in any tree") {
    val orders = Tables.orders(spark, sfDir)
    val direct = mrows(IncrementalAgg.finalizeMoments(
      IncrementalAgg.partialMoments(orders)))
    for (cut <- Seq("1993-06-01", "1998-01-01")) {
      val base = orders.filter(col("o_orderdate") < lit(cut))
      val delta = orders.filter(col("o_orderdate") >= lit(cut))
      val merged = mrows(IncrementalAgg.finalizeMoments(
        IncrementalAgg.mergeMoments(
          IncrementalAgg.partialMoments(base),
          IncrementalAgg.partialMoments(delta))))
      assert(merged === direct, s"split at $cut")
    }
    val a = IncrementalAgg.partialMoments(orders.filter(col("o_orderkey") % 3 === 0))
    val b = IncrementalAgg.partialMoments(orders.filter(col("o_orderkey") % 3 === 1))
    val c = IncrementalAgg.partialMoments(orders.filter(col("o_orderkey") % 3 === 2))
    assert(mrows(IncrementalAgg.finalizeMoments(
      IncrementalAgg.mergeMoments(IncrementalAgg.mergeMoments(a, b), c))) === direct)
    assert(mrows(IncrementalAgg.finalizeMoments(
      IncrementalAgg.mergeMoments(a, IncrementalAgg.mergeMoments(b, c)))) === direct)
  }

  test("derived moments agree with Spark's own var_pop/skewness to float tolerance") {
    val orders = Tables.orders(spark, sfDir)
    val ours = mrows(IncrementalAgg.finalizeMoments(
      IncrementalAgg.partialMoments(orders))).map(t => t._1 -> t).toMap
    val ref = orders.groupBy(col("o_orderpriority"))
      .agg(avg(col("o_totalprice")).as("m"),
        stddev_pop(col("o_totalprice")).as("v"),
        skewness(col("o_totalprice")).as("sk"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    for ((g, (m, v, sk)) <- ref) {
      val (_, _, om, ov, osk) = ours(g)
      assert(math.abs(om - m) / m < 1e-9, s"$g mean")
      assert(math.abs(ov - v) / v < 1e-6, s"$g stddev")
      // Spark's skewness is the population skew too (m3 / m2^1.5)
      assert(math.abs(osk - sk) < 1e-6, s"$g skew: $osk vs $sk")
    }
  }

  private def distState(df: DataFrame): Seq[(String, Seq[Long], Boolean)] =
    df.select(col("grp"), col("minima"), col("sat")).orderBy(col("grp"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getBoolean(2)))
      .toSeq

  test("distinct state is split-independent, merge-associative, exact " +
    "until k, and a flagged in-tolerance estimate past it") {
    import spark.implicits._
    // grp a: 40 distinct (< k=64, exact); grp b: 500 distinct (saturates)
    val data = ((1 to 120).map(i => ("a", (i % 40).toLong)) ++
      (1 to 1500).map(i => ("b", (i % 500).toLong * 7919L)))
      .toDF("grp", "v")
    val k = 64
    def part(f: DataFrame => DataFrame) =
      IncrementalAgg.partialDistinct(f(data), "grp", "v", k)
    val oneShot = distState(part(identity))
    // arbitrary ROW splits converge to the same state bit-for-bit
    val m2 = IncrementalAgg.mergeDistinct(
      part(_.filter(col("v") % 2 === 0)), part(_.filter(col("v") % 2 === 1)),
      "grp", k)
    assert(distState(m2) === oneShot)
    // associativity across a three-way split
    val abc = Seq(0, 1, 2).map(i => part(_.filter(col("v") % 3 === i)))
    val lhs = IncrementalAgg.mergeDistinct(
      IncrementalAgg.mergeDistinct(abc(0), abc(1), "grp", k), abc(2), "grp", k)
    val rhs = IncrementalAgg.mergeDistinct(
      abc(0), IncrementalAgg.mergeDistinct(abc(1), abc(2), "grp", k), "grp", k)
    assert(distState(lhs) === distState(rhs))
    assert(distState(lhs) === oneShot)
    // finalize: exact where unsaturated, flagged estimate within KMV
    // tolerance where saturated (k=64 → RSE ≈ 1/√62 ≈ 13%)
    val fin = IncrementalAgg.finalizeDistinct(m2, "grp", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val Some(a) = fin.find(_._1 == "a")
    val Some(b) = fin.find(_._1 == "b")
    assert(a === (("a", 40L, false)))
    assert(b._3 === true && math.abs(b._2 - 500.0) / 500.0 < 0.4)
    // all-NULL group carries no state row; NULLs never count
    val withNulls = Seq(("c", Option.empty[Long]),
      ("a", Option(1L))).toDF("grp", "v")
    assert(IncrementalAgg.partialDistinct(withNulls, "grp", "v", k)
      .filter(col("grp") === "c").isEmpty)
  }
}
