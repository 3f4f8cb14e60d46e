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

  /** #55 (q50) Event-type transition matrix: counts of consecutive
    * (prev → next) event-type pairs per user timeline — the Markov /
    * funnel view of the event stream. One lag window (shuffle on
    * user_id) + one map-side-combined pair aggregate; transition
    * probability denominated per source state. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("from_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        (round(col("n").cast("double") / sum(col("n")).over(w), 4) + 0.0))
  }

  val transitionsSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events),
      |pairs AS (
      |  SELECT from_type, event_type AS to_type, count(*) AS n
      |  FROM lagged WHERE from_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) + 0.0 AS p
      |FROM pairs""".stripMargin

  /** #56 (q51) Cohort retention: users grouped by first-activity day,
    * counted by how many days after that first day they were active —
    * the standard retention triangle. Two keyed aggregates (per-user
    * min, then cohort × offset distinct users), both map-side
    * partials; no self-join of the fact against itself. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    // cohort day as a whole-partition window min: ONE fact scan and one
    // shuffle — an aggregate+self-join form reads the fact twice and
    // sort-merges two full-size sides (the q40 double-scan trap)
    val wUser = Window.partitionBy(col("user_id"))
    ev.withColumn("cohort_day", min(col("day")).over(wUser))
      .groupBy(
        // string-typed day: parquet DATE and DuckDB DATE round-trip to
        // different pandas dtypes in the comparer; ISO text is stable
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val cohortRetentionSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
      |  CAST(day - cohort_day AS BIGINT) AS day_offset,
      |  count(DISTINCT ev.user_id) AS n_users
      |FROM ev JOIN first ON ev.user_id = first.user_id
      |GROUP BY 1, 2""".stripMargin

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
