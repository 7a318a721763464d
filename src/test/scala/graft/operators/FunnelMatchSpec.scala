package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Sequence-pattern semantics: the funnel completes only on a strict
  * view → click → purchase time ordering, and the plan shuffles once.
  */
class FunnelMatchSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("strict ordering: only in-order view→click→purchase completes") {
    import spark.implicits._
    val events = Seq(
      // user 1: clean completion (with noise events in between)
      (1L, 10L, ts(1), "view"), (1L, 11L, ts(2), "error"),
      (1L, 12L, ts(3), "click"), (1L, 13L, ts(4), "purchase"),
      // user 2: click BEFORE any view — never completes
      (2L, 20L, ts(1), "click"), (2L, 21L, ts(2), "view"),
      (2L, 22L, ts(3), "purchase"),
      // user 3: purchase before the click — completes only at the LATER purchase
      (3L, 30L, ts(1), "view"), (3L, 31L, ts(2), "purchase"),
      (3L, 32L, ts(3), "click"), (3L, 33L, ts(4), "purchase"),
      // user 4: full funnel missing the purchase
      (4L, 40L, ts(1), "view"), (4L, 41L, ts(2), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")

    val got = Events.funnelMatchOn(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    def us(m: Int) = ts(m).getTime * 1000L
    assert(got.toSeq === Seq(
      (1L, us(1), us(4), us(4) - us(1)),
      (3L, us(1), us(4), us(4) - us(1))))
  }

  test("same-timestamp events break ties by event_id (strictly-prior frame)") {
    import spark.implicits._
    // view and click share a timestamp: click (higher id) sees the view as
    // prior; purchase at the same instant with a yet-higher id completes.
    val events = Seq(
      (1L, 1L, ts(5), "view"), (1L, 2L, ts(5), "click"),
      (1L, 3L, ts(5), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(Events.funnelMatchOn(events).count() === 1)
    // reversed ids: the "click" precedes the view in frame order — no match
    val reversed = Seq(
      (1L, 3L, ts(5), "view"), (1L, 2L, ts(5), "click"),
      (1L, 1L, ts(5), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(Events.funnelMatchOn(reversed).count() === 0)
  }

  test("plan shuffles once on user_id (windows + final agg share it)") {
    val plan = Events.funnelMatch(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1, plan)
  }
}
