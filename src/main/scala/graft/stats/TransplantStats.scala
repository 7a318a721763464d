package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3 — the transplant statistics block (similarity_search.py:366-407) and
  * A6 — clinical-insight means (similarity_search.py:707-738), each as ONE
  * conditional-aggregation pass over the hit set (no per-filter re-scan:
  * every `[r for r in results if ...]` list comprehension in the reference
  * becomes a `sum(when(...))` / `avg(when(...))` inside the same agg).
  */
object TransplantStats {

  /** The reference's stats dict, 1 row. Rates are guarded like the
    * reference (`if total > 0`); avg wait time is over transplanted only.
    */
  def statisticsBlock(hits: DataFrame): DataFrame = {
    val t = col("received_transplant") // promoted boolean on index rows
    hits.agg(
      count(lit(1)).as("total_similar_patients"),
      sum(when(t, 1L).otherwise(0L)).as("transplanted_count"),
      sum(when(!t, 1L).otherwise(0L)).as("not_transplanted_count"),
      // rate guards mirror the reference's `if transplanted:` blocks
      // (similarity_search.py:380, 383) — NULL when the cohort is empty
      // (ANSI mode would otherwise raise DIVIDE_BY_ZERO)
      (sum(when(t, 1L).otherwise(0L)) / nullif(count(lit(1)), lit(0L)))
        .as("transplant_rate"),
      sum(when(t && col("transplant_success"), 1L).otherwise(0L))
        .as("successful_transplants"),
      (sum(when(t && col("transplant_success"), 1L).otherwise(0L)) /
        nullif(sum(when(t, 1L).otherwise(0L)), lit(0L)))
        .as("transplant_success_rate"),
      avg(when(t, col("days_to_transplant"))).as("average_wait_time_days"),
      (avg(when(t, col("days_to_transplant"))) / 30.44)
        .as("average_wait_time_months"),
      sum(when(!t && col("waitlist_status") === 0, 1L).otherwise(0L))
        .as("still_on_waitlist"),
      sum(when(!t && col("waitlist_status") === 1, 1L).otherwise(0L))
        .as("removed_too_sick"),
      sum(when(!t && col("waitlist_status") === 2, 1L).otherwise(0L))
        .as("removed_improved"),
      sum(when(!t && col("waitlist_status") === 3, 1L).otherwise(0L))
        .as("deceased_on_waitlist"))
  }

  /** A6 — clinical insights over the hit set (metadata sub-fields):
    * wait-time/age/MELD/diabetes means over the transplanted-successful /
    * not-transplanted partitions (similarity_search.py:711-734).
    */
  def clinicalInsights(hits: DataFrame): DataFrame = {
    val t = col("received_transplant")
    val succ = t && col("transplant_success")
    hits.agg(
      avg(when(t, col("days_to_transplant"))).as("avg_wait_transplanted_days"),
      (avg(when(t, col("days_to_transplant"))) / 30.44)
        .as("avg_wait_transplanted_months"),
      avg(when(succ, col("metadata.age"))).as("avg_age_success"),
      avg(when(succ, col("metadata.meld_score"))).as("avg_meld_success"),
      avg(when(succ, col("metadata.diabetes").cast("int")))
        .as("diabetes_rate_success"),
      avg(when(!t, col("metadata.days_on_waitlist")))
        .as("avg_wait_not_transplanted_days"),
      sum(when(!t && col("waitlist_status") === 0, 1L).otherwise(0L))
        .as("still_waiting"))
  }
}
