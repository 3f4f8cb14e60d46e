package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Last-touch revenue attribution — credit each conversion (purchase)
  * to the most recent preceding touch event (view / click / signup) by
  * the same user inside a lookback window, then roll revenue up by the
  * credited touch type. The standard marketing/growth analytics join
  * ([[Funnel]] answers "did the path complete?"; attribution answers
  * "which step gets the revenue?").
  *
  * Scale shape: ONE per-user ordered window (partitioned by user — no
  * global sort) carrying the running last touch, then one small
  * aggregate. The naive formulation is a time-range self-join of
  * purchases × touches (quadratic in events-per-user); the running
  * window is O(events) with O(1) state per user. Ordering is total —
  * (`ts`, `event_id`) — so the carried touch is deterministic even
  * with equal timestamps; the frame is explicit ROWS (not the default
  * RANGE) so both engines agree on peer handling. The three carried
  * touch attributes (type, ts) come from three `last(..., ignoreNulls)`
  * calls over the SAME frame with the SAME null pattern, so they can
  * never mix rows.
  *
  * Revenue sums are exact fixed-point (`Σ floor(value·1e4)`, the q32
  * technique), divided back once at the end.
  */
object Attribution {

  /** Lookback: a touch older than this at conversion time gets no
    * credit (the conversion books as `organic`). */
  val LookbackDays = 7

  /** Generic last-touch attribution over an events frame with
    * (user_id, ts, event_id, event_type, value).
    * @return (touch_type, n_conversions, revenue) — `touch_type` is the
    *         credited channel, `organic` when no in-window touch exists. */
  def lastTouch(events: DataFrame, lookbackDays: Int = LookbackDays): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("event_type").isin("view", "click", "signup")
    val ev = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("t_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("t_ts", last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
    ev.filter(col("event_type") === "purchase")
      .select(
        when(col("t_type").isNotNull &&
          col("t_ts") >= expr(s"ts - INTERVAL $lookbackDays DAYS"),
          col("t_type")).otherwise(lit("organic")).as("touch_type"),
        col("value"))
      .groupBy("touch_type")
      .agg(
        count(lit(1)).as("n_conversions"),
        (expr("sum(CAST(floor(coalesce(value, 0) * 10000) AS BIGINT))") / 10000.0)
          .as("revenue"))
  }

  /** q80 over the events table. */
  def lastTouch(spark: SparkSession, dir: String): DataFrame =
    lastTouch(Tables.events(spark, dir))

  val lastTouchSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id, event_type, value,
       |    last_value(CASE WHEN event_type IN ('view','click','signup')
       |                    THEN event_type END IGNORE NULLS)
       |      OVER w AS t_type,
       |    last_value(CASE WHEN event_type IN ('view','click','signup')
       |                    THEN ts END IGNORE NULLS)
       |      OVER w AS t_ts
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT CASE WHEN t_type IS NOT NULL
       |            AND t_ts >= ts - INTERVAL $LookbackDays DAY
       |            THEN t_type ELSE 'organic' END AS touch_type,
       |  count(*) AS n_conversions,
       |  CAST(sum(CAST(floor(coalesce(value, 0) * 10000) AS BIGINT)) AS DOUBLE)
       |    / 10000.0 AS revenue
       |FROM ev WHERE event_type = 'purchase'
       |GROUP BY 1""".stripMargin
}
