package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Last-touch attribution semantics on hand-built event sequences, and an
  * independent scalar recompute of the MAD outlier rule on the corpus.
  */
class AttributionSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("event paths: transitions match a per-user scalar recompute") {
    val evs = graft.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq.sliding(2)
        .collect { case Seq(a, b) => (a, b, u) }.toSeq
    }
    val byEdge = expect.groupBy(e => (e._1, e._2)).map { case (k, v) =>
      k -> ((v.size.toLong, v.map(_._3).distinct.size.toLong))
    }
    val want = byEdge.toSeq
      .sortBy { case ((f, t), (n, _)) => (-n, f, t) }.take(20)
      .map { case ((f, t), (n, u)) => (f, t, n, u) }
    val got = Events.eventPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
  }

  test("purchase credits the most recent prior non-purchase touch") {
    import spark.implicits._
    val events = Seq(
      // user 1: view then click then purchase → click gets the credit
      (1L, 10L, ts(1), "view", 10.0),
      (1L, 11L, ts(2), "click", 0.0),
      (1L, 12L, ts(3), "purchase", 100.0),
      // user 2: purchase with NO prior touch → direct
      (2L, 20L, ts(1), "purchase", 50.0),
      // user 2 again: a later purchase after a view → view
      (2L, 21L, ts(2), "view", 0.0),
      (2L, 22L, ts(3), "purchase", 25.0),
      // user 3: back-to-back purchases share the same last touch; a prior
      // purchase is never a touchpoint
      (3L, 30L, ts(1), "signup", 0.0),
      (3L, 31L, ts(2), "purchase", 30.0),
      (3L, 32L, ts(3), "purchase", 40.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")

    val got = Events.attributionOn(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(
      ("click", 1L, 100.0),
      ("direct", 1L, 50.0),
      ("view", 1L, 25.0),
      ("signup", 2L, 70.0)))
  }

  test("MAD outlier counts match an independent scalar recompute") {
    val rows = Relational.outliersMad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byStatus = graft.Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def medianOf(xs: Seq[Double]): Double = {
      val n = xs.size
      if (n % 2 == 1) xs(n / 2)
      else {
        // linear interpolation at rank (n-1)/2: both engines' definition
        val lo = xs(n / 2 - 1); val hi = xs(n / 2)
        lo + (hi - lo) * 0.5
      }
    }
    for (r <- rows) {
      val xs = byStatus(r.getString(0))
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)).sorted)
      val nOut = xs.count(x => math.abs(x - med) > 3.0 * 1.4826 * mad)
      assert(r.getLong(1) === xs.size.toLong, s"n for ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - med) < 1e-4, s"median for ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - mad) < 1e-4, s"mad for ${r.getString(0)}")
      assert(r.getLong(4) === nOut.toLong, s"outliers for ${r.getString(0)}")
    }
  }
}
