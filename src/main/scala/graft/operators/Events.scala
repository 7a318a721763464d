package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Event-log operators over the `events` table (`[EXT]`, SURVEY.md §2.8/§2.9):
  * JSON extraction, time bucketing (the batch shape of the streaming
  * tumbling-window agg — the streaming variant lives in
  * [[graft.streaming.EventStreams]]), and gap-based sessionization.
  */
object Events extends QueryPack {

  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** JSON field extraction from the `props` column + aggregation.
    * `get_json_object` is codegen'd; at scale prefer `from_json` with an
    * explicit schema once per row over repeated path probes.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Tumbling 1-hour windows: count + value sum per (hour, type). */
  def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Sliding windows (1-hour width, 30-minute slide) — each event lands
    * in exactly two windows; `window()` is the same construct Structured
    * Streaming uses, so this is the batch form of the streaming sliding
    * agg. (Oracle: union of two tumbling grids shifted by the slide.)
    */
  def slidingCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))

  /** Native session windows: `session_window(ts, gap)` merges events
    * closer than the gap into one window per key — the built-in form of
    * the lag-based sessionization below (Spark closes a session when the
    * next event is ≥ gap away).
    */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))

  /** Gap-based sessionization: a new session starts when >30 min elapse
    * since the user's previous event (lag window). Partitioned by user —
    * shuffles once on user_id, then everything is per-partition; the same
    * plan holds at 100 TB since sessions never cross users.
    */
  def sessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 100)
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .withColumn("new_session",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** Top spenders on the purchase slice — filter pushed to scan, then a
    * pre-aggregated (map-side combined) hash agg and TakeOrdered top-k.
    */
  def topPurchasers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), decSum(col("value")).as("total_spent"))
      .orderBy(col("total_spent").desc, col("user_id"))
      .limit(10)

  /** Per-type top-3 events by value through the native `topk_by`
    * TypedImperativeAggregate — oracle-checked against a window query.
    */
  def topkByType(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.TopKByExpr(col("event_id"), col("value"), 3).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("event_id"), col("col.score").as("value"))
      .orderBy(col("event_type"), col("rank"))

  /** Sequence-pattern match (the MATCH_RECOGNIZE gap in Spark SQL):
    * view → click → purchase, strictly time-ordered per user, earliest
    * completion. Two chained running-min windows over ONE per-user
    * ordering: `view_before` marks each row that has a prior view;
    * `qclick_before` marks each row with a prior click that itself had a
    * prior view; a purchase with `qclick_before` set completes the
    * pattern. Scale shape: one exchange on user_id + one sort feeds both
    * window passes AND the final per-user aggregate (same partitioning —
    * no second shuffle); state per row is two timestamps, never a
    * collected event array, so a hot user cannot blow a task's memory.
    */
  def funnelMatch(s: SparkSession, dir: String): DataFrame =
    funnelMatchOn(Tables.events(s, dir))

  /** Core pattern matcher over any (user_id, event_id, ts, event_type)
    * frame — split out so specs can drive hand-built sequences.
    */
  private[graft] def funnelMatchOn(events: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("view_before",
        min(when(col("event_type") === "view", col("ts"))).over(wPrev))
      .withColumn("qclick_before",
        min(when(col("event_type") === "click" && col("view_before").isNotNull,
          col("ts"))).over(wPrev))
      .groupBy(col("user_id"))
      .agg(
        unix_micros(min(when(col("event_type") === "view", col("ts"))))
          .as("started_us"),
        unix_micros(min(when(col("event_type") === "purchase" &&
          col("qclick_before").isNotNull, col("ts")))).as("completed_us"))
      .filter(col("completed_us").isNotNull)
      .select(col("user_id"), col("started_us"), col("completed_us"),
        (col("completed_us") - col("started_us")).as("funnel_us"))
      .orderBy(col("user_id"))
  }

  /** Last-touch attribution: each purchase's value is credited to the
    * user's most recent PRIOR non-purchase touchpoint (view/click/signup;
    * purchases with no prior touch are 'direct'). One `last(..., ignore
    * nulls)` window over the same per-user ordering the funnel uses, then
    * a small grouped rollup — one shuffle on user_id, one on the
    * (few-valued) channel key.
    */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame =
    attributionOn(Tables.events(s, dir))

  private[graft] def attributionOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("last_touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        decSum(col("value")).as("attributed_value"))
      .orderBy(col("channel"))
  }

  /** Event-transition path analysis — the Sankey/"user paths" source
    * table every product-analytics stack derives: per-user consecutive
    * event-type transitions via one `lead` window, then a grouped count
    * with distinct-user reach per (from, to) edge. Same per-user
    * (ts, event_id) ordering contract as the funnel and attribution; one
    * shuffle on user_id, one on the tiny edge key. Top 20 edges by
    * transition count.
    */
  def eventPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("n_transitions").desc, col("from_type"), col("to_type"))
      .limit(20)
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_event_paths"     -> (eventPaths _),
    "q_attribution"     -> (lastTouchAttribution _),
    "q_funnel_match"    -> (funnelMatch _),
    "q_stream_funnel"   -> (graft.streaming.FunnelStream.funnelStreaming _),
    "q_topk_by_type"    -> (topkByType _),
    "q_events_json"     -> (jsonExtract _),
    "q_events_hourly"   -> (hourlyCounts _),
    "q_events_sliding"  -> (slidingCounts _),
    "q_session_window"  -> (sessionWindows _),
    "q_events_sessions" -> (sessions _),
    "q_events_topusers" -> (topPurchasers _))

  /** Shared by the batch query and its streaming twin: the streaming
    * state machine is exact under the arrival-order contract
    * ([[graft.streaming.FunnelStream]]), so both reduce to this SQL.
    */
  private val funnelOracle =
    """WITH f AS (SELECT user_id, event_id, ts, event_type FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |e1 AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END) OVER w AS view_before
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |e2 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'click' AND view_before IS NOT NULL
        |             THEN ts END) OVER w AS qclick_before
        |  FROM e1
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, started_us, completed_us,
        |  completed_us - started_us AS funnel_us
        |FROM (
        |  SELECT user_id,
        |    epoch_us(min(CASE WHEN event_type = 'view' THEN ts END)) AS started_us,
        |    epoch_us(min(CASE WHEN event_type = 'purchase'
        |             AND qclick_before IS NOT NULL THEN ts END)) AS completed_us
        |  FROM e2 GROUP BY user_id)
        |WHERE completed_us IS NOT NULL
        |ORDER BY user_id""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_event_paths" ->
      """SELECT event_type AS from_type, next_type AS to_type,
        |  count(*) AS n_transitions,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |WHERE next_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY n_transitions DESC, from_type, to_type
        |LIMIT 20""".stripMargin,
    "q_attribution" ->
      """SELECT coalesce(last_touch, 'direct') AS channel,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
        |FROM (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS) OVER w AS last_touch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_funnel_match"  -> funnelOracle,
    "q_stream_funnel" -> funnelOracle,
    "q_topk_by_type" ->
      """SELECT event_type, CAST(rank AS INT) AS rank, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |   row_number() OVER (PARTITION BY event_type
        |     ORDER BY value DESC, event_id) AS rank
        |  FROM events)
        | WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        | FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_events_sliding" ->
      """WITH grid AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |   event_type FROM events
        |  UNION ALL
        |  SELECT strftime(date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE,
        |    '%Y-%m-%d %H:%M:%S') AS w_start,
        |   event_type FROM events)
        | SELECT w_start, event_type, count(*) AS n
        | FROM grid GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |   CASE WHEN lag(ts) OVER w IS NULL
        |     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WHERE user_id < 50
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | sess AS (
        |  SELECT user_id,
        |   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        | per_session AS (
        |  SELECT user_id, sid, count(*) AS n_events
        |  FROM sess GROUP BY user_id, sid)
        | SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(max(n_events) AS BIGINT) AS max_session_events
        | FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_sessions" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_session) AS BIGINT) AS n_sessions
        | FROM (
        |  SELECT user_id,
        |   CASE WHEN date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |        THEN 1 ELSE 0 END AS new_session
        |  FROM events WHERE user_id < 100)
        | GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_topusers" ->
      """SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        | FROM events WHERE event_type = 'purchase'
        | GROUP BY user_id ORDER BY total_spent DESC, user_id LIMIT 10""".stripMargin)
}
