package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` Time-series regularization — resampling an irregular event
  * stream onto a fixed grid with gap filling, the preprocessing step
  * every monitoring / feature-engineering pipeline runs before
  * modeling (the reference's pipeline consumes a REGULAR feature
  * matrix; this operator is how a raw event log becomes one).
  *
  * Shapes (both per entity, hourly grid between the entity's first and
  * last observed hour):
  *
  *  - '''forward fill''' ([[resampleFfill]]): each empty grid cell
  *    carries the last observed value — the step-function reading of a
  *    sensor/state series.
  *  - '''linear interpolation''' ([[resampleInterp]]): each empty cell
  *    takes the straight line between its surrounding observations —
  *    the continuous reading.
  *
  * 100 TB design: everything is hash-partitioned by the entity key.
  * The hourly pre-aggregation combines map-side, the grid is built by
  * `sequence()` per entity (never a driver loop, never a cross join
  * against a global calendar — each entity explodes only ITS OWN
  * span), the fill/interp are single-pass window functions over the
  * entity's partition. Grid cells per entity are bounded by the
  * entity's observed span, so skew follows the span distribution, not
  * the event count — a hot entity with millions of events still
  * resamples to span-many cells (the hourly agg absorbed the volume
  * map-side).
  */
object TimeSeries extends QueryPack {

  /** (entity, grid hour, observed v or null) — the per-(entity, hour)
    * decimal-exact sums of `value` attached to the regular hourly grid
    * spanning each entity's first to last observed hour; both fills
    * window over this.
    */
  private[operators] def grid(events: DataFrame): DataFrame = {
    val hv = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val bounds = hv.groupBy(col("user_id"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    bounds.select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
      .join(hv, Seq("user_id", "h"), "left")
  }

  /** Hourly resample with FORWARD FILL: empty cells carry the last
    * observed hourly sum; `is_gap` marks carried cells. The grid starts
    * at each entity's first observed hour, so the fill is total (no
    * leading nulls).
    */
  private[operators] def ffillOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid(events).select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        last(col("v"), ignoreNulls = true).over(w).as("filled_value"),
        col("v").isNull.cast("int").as("is_gap"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Driver query: the fixture's event log, entity set bounded for the
    * verify gate's output size.
    */
  def resampleFfill(s: SparkSession, dir: String): DataFrame =
    ffillOf(Tables.events(s, dir).filter(col("user_id") % 41 === 0))

  /** Hourly resample with LINEAR INTERPOLATION: an empty cell at t
    * between observations (t0,v0) and (t1,v1) takes
    * v0 + (v1−v0)·(t−t0)/(t1−t0); observed cells keep their value.
    * Interior gaps always have both neighbors (the grid spans first to
    * last observation). Rounded to 6 decimals (oracle-parity rule for
    * derived floats).
    */
  private[operators] def interpOf(events: DataFrame): DataFrame = {
    val back = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsH = when(col("v").isNotNull, col("h"))
    val t = unix_timestamp(col("h")).cast("double")
    val t0 = unix_timestamp(last(obsH, ignoreNulls = true).over(back)).cast("double")
    val t1 = unix_timestamp(first(obsH, ignoreNulls = true).over(fwd)).cast("double")
    val v0 = last(col("v"), ignoreNulls = true).over(back)
    val v1 = first(col("v"), ignoreNulls = true).over(fwd)
    val interp = when(col("v").isNotNull, col("v"))
      .otherwise(v0 + (v1 - v0) * (t - t0) / (t1 - t0))
    grid(events).select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        round(interp, 6).as("interp_value"))
      .orderBy(col("user_id"), col("hour"))
  }

  def resampleInterp(s: SparkSession, dir: String): DataFrame =
    interpOf(Tables.events(s, dir).filter(col("user_id") % 41 === 0))

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_resample_ffill" -> (resampleFfill _),
    "q_resample_interp" -> (resampleInterp _))

  private val gridSql =
    """hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events WHERE user_id % 41 = 0 GROUP BY 1, 2),
      |bounds AS (
      |  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |  FROM bounds),
      |cells AS (
      |  SELECT g.user_id, g.h, hv.v FROM grid g
      |  LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_resample_ffill" ->
      s"""WITH $gridSql
         |SELECT user_id,
         |  strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
         |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
         |  CAST(v IS NULL AS INT) AS is_gap
         |FROM cells ORDER BY user_id, hour""".stripMargin,
    "q_resample_interp" ->
      s"""WITH $gridSql,
         |marked AS (
         |  SELECT user_id, h, v,
         |    last_value(v IGNORE NULLS) OVER wb AS v0,
         |    first_value(v IGNORE NULLS) OVER wf AS v1,
         |    CAST(epoch(last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
         |      OVER wb) AS DOUBLE) AS t0,
         |    CAST(epoch(first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
         |      OVER wf) AS DOUBLE) AS t1
         |  FROM cells
         |  WINDOW wb AS (PARTITION BY user_id ORDER BY h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS (PARTITION BY user_id ORDER BY h
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
         |  round(CASE WHEN v IS NOT NULL THEN v
         |    ELSE v0 + (v1 - v0) * (CAST(epoch(h) AS DOUBLE) - t0) / (t1 - t0)
         |    END, 6) AS interp_value
         |FROM marked ORDER BY user_id, hour""".stripMargin)
}
