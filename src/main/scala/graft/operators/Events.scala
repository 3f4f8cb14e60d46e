package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-table analytics (SURVEY.md §2 #17–18) — the batch twins of the
  * streaming operators in [[graft.streaming.EventStream]]. The reference
  * runs its pipelines on a daily Airflow schedule
  * (dags/district_gis_etl.py); on Spark the same logic is a windowed
  * aggregation usable both in batch and as an incremental stream.
  */
object Events {

  /** #17 Tumbling-window aggregation: per hour × event_type counts,
    * value sums, and the mean of a JSON-extracted property. At scale
    * this is a single shuffle on (hour, type) with map-side partials.
    */
  def eventWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (round(sum(col("value")), 4) + 0.0).as("sum_value"),
        (round(avg(get_json_object(col("props"), "$.k").try_cast("int")), 4) + 0.0).as("avg_k"))

  /** #18 Gap-based sessionization (batch): a session breaks after 30
    * minutes of user inactivity. lag + running sum of session breaks —
    * one shuffle on user_id; each user's timeline sorts locally within
    * its partition.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = 30 * 60 * 1000L
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (round(sum(col("value")), 4) + 0.0).as("sum_value"))
  }

  /** #45 (q44) Rolling/cumulative window aggregates per user timeline:
    * 5-row moving average, running total, and running peak of `value`,
    * ordered by (ts, event_id). One shuffle on user_id; the frame
    * aggregates evaluate locally per partition — the canonical
    * distributed rolling-metric shape (no self-join, no explode). */
  def rollingStats(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val last5 = byUser.rowsBetween(-4, Window.currentRow)
    val sofar = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        (round(avg(col("value")).over(last5), 4) + 0.0).as("avg_5"),
        (round(sum(col("value")).over(sofar), 4) + 0.0).as("cum_value"),
        (round(max(col("value")).over(sofar), 4) + 0.0).as("peak_value"),
        row_number().over(byUser).cast("long").as("seq"))
      .withColumn("value", round(col("value"), 4) + 0.0)
  }

  /** DuckDB twin of [[rollingStats]] — same frames, same (ts, event_id)
    * order, same 4dp rounding. */
  val rollingStatsSql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, value FROM events WHERE value IS NOT NULL)
      |SELECT user_id, ts, event_id, round(value, 4) + 0.0 AS value,
      |  round(avg(value) OVER w5, 4) + 0.0 AS avg_5,
      |  round(sum(value) OVER wc, 4) + 0.0 AS cum_value,
      |  round(max(value) OVER wc, 4) + 0.0 AS peak_value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      |FROM ev
      |WINDOW
      |  w5 AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |  wc AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS UNBOUNDED PRECEDING)""".stripMargin
}
