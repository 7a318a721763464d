package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Resample/gap-fill semantics pinned on a hand-computed series:
  * user 1 observes hourly sums 10, 20 at hours 0-1, nothing at 2-3,
  * 50 at hour 4 — forward fill carries 20 through the gap, linear
  * interpolation walks 30, 40; user 2 has a single observation (a
  * one-cell grid, no gaps); multiple events in one hour sum first.
  */
class TimeSeriesSpec extends SparkSpec {

  private def ev(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "tss", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"), col("value"))
  }

  private val fixture = ev(
    (1L, "2024-03-01 00:10:00", 4.0),
    (1L, "2024-03-01 00:40:00", 6.0),   // hour 0 sums to 10
    (1L, "2024-03-01 01:15:00", 20.0),
    (1L, "2024-03-01 04:05:00", 50.0),
    (2L, "2024-03-02 12:30:00", 7.0))

  test("forward fill carries the last observed hourly sum through gaps") {
    val got = TimeSeries.ffillOf(fixture)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(got === Array(
      (1L, "2024-03-01 00:00:00", 10.0, 0),
      (1L, "2024-03-01 01:00:00", 20.0, 0),
      (1L, "2024-03-01 02:00:00", 20.0, 1),
      (1L, "2024-03-01 03:00:00", 20.0, 1),
      (1L, "2024-03-01 04:00:00", 50.0, 0),
      (2L, "2024-03-02 12:00:00", 7.0, 0)))
  }

  test("linear interpolation walks the line between surrounding observations") {
    val got = TimeSeries.interpOf(fixture)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got === Array(
      (1L, "2024-03-01 00:00:00", 10.0),
      (1L, "2024-03-01 01:00:00", 20.0),
      (1L, "2024-03-01 02:00:00", 30.0),
      (1L, "2024-03-01 03:00:00", 40.0),
      (1L, "2024-03-01 04:00:00", 50.0),
      (2L, "2024-03-02 12:00:00", 7.0)))
  }

  test("a gap-free series is returned unchanged by both fills") {
    val dense = ev(
      (3L, "2024-03-01 00:00:00", 1.0),
      (3L, "2024-03-01 01:00:00", 2.0),
      (3L, "2024-03-01 02:00:00", 3.0))
    val ff = TimeSeries.ffillOf(dense).collect()
    assert(ff.map(_.getDouble(2)).toSeq === Seq(1.0, 2.0, 3.0))
    assert(ff.forall(_.getInt(3) == 0))
    assert(TimeSeries.interpOf(dense).collect()
      .map(_.getDouble(2)).toSeq === Seq(1.0, 2.0, 3.0))
  }
}
