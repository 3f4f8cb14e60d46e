package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-weighted average value (TWAP) per series — the mean of a
  * sampled signal weighted by how LONG each sample was in force, not
  * how often it was sampled. An event stream that reports a gauge on
  * change (price, queue depth, sensor reading) oversamples volatile
  * periods; the arithmetic mean of samples is biased toward churn,
  * the time-weighted mean is not. The standard fix for
  * irregularly-sampled telemetry and the fair-price convention in
  * finance.
  *
  * Semantics: each event's value holds from its timestamp until the
  * series' next event (step-function / LOCF reading, the q72
  * convention); the last event has no successor and carries no
  * weight. TWAP = Σ vᵢ·Δᵢ / Σ Δᵢ over the closed intervals.
  *
  * Exactness: value snapped to cents per row, timestamps to exact
  * integer MICROSECONDS (`unix_micros` on the micro-truncated ts —
  * the twin floors nanos by 1000, identical for the epoch range);
  * every product vᵢ·Δᵢ is decimal-first; ONE shared-text division at
  * display. (ts, event_id) is a total order — equal-micro ties get
  * Δ = 0 from the lead and contribute nothing, so tie order cannot
  * change the sums.
  *
  * Scale: one window per SERIES key (user here) — per-key row counts
  * are organic-activity-bounded, so the shuffle is uniform; nothing
  * global. At 100 TB the same shape holds: partition by series,
  * sort by time within. */
object Twap {

  /** Per-series TWAP frame: (series, n_events, n_intervals, span_s,
    * twap). Single-event series → NULL twap (no closed interval). */
  def timeWeightedAvg(df: DataFrame, seriesCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("us"), col("tie"))
    df
      .filter(col(valueCol).isNotNull)
      .select(col(seriesCol).as("g"), col(tieCol).as("tie"),
        expr(s"unix_micros($tsCol)").as("us"),
        expr(s"CAST(floor($valueCol * 1e2) AS BIGINT)").as("vc"))
      .withColumn("dus", lead(col("us"), 1).over(w) - col("us"))
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_events"),
        expr("CAST(count(dus) AS BIGINT)").as("n_intervals"),
        expr("CAST(coalesce(sum(dus), 0) AS BIGINT)").as("w_us"),
        expr("CAST(sum(CAST(vc AS DECIMAL(38,0)) * dus) AS DECIMAL(38,0))")
          .as("vw"))
      .selectExpr(s"g AS $seriesCol", "n_events", "n_intervals",
        "round(CAST(w_us AS DOUBLE) / 1e6, 3) + 0.0 AS span_s",
        "round(CAST(vw AS DOUBLE)" +
          " / nullif(CAST(w_us AS DOUBLE), 0e0) / 1e2, 6) + 0.0 AS twap")
  }

  /** q113: each user's time-weighted mean event value — what level
    * did the user's gauge actually SIT at, vs the sample mean q1-style
    * aggregates report. */
  def userTwap(spark: SparkSession, dir: String): DataFrame =
    timeWeightedAvg(Tables.events(spark, dir), "user_id", "ts",
      "event_id", "value")

  val userTwapSql: String =
    """WITH x AS (
      |  SELECT user_id AS g, event_id AS tie,
      |    epoch_ns(ts) // 1000 AS us,
      |    CAST(floor(value * 1e2) AS BIGINT) AS vc
      |  FROM events WHERE value IS NOT NULL),
      |d AS (
      |  SELECT g, us, vc,
      |    lead(us) OVER (PARTITION BY g ORDER BY us, tie) - us AS dus
      |  FROM x),
      |agg AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(count(dus) AS BIGINT) AS n_intervals,
      |    CAST(coalesce(sum(dus), 0) AS BIGINT) AS w_us,
      |    CAST(sum(CAST(vc AS HUGEINT) * dus) AS DECIMAL(38,0)) AS vw
      |  FROM d GROUP BY 1)
      |SELECT g AS user_id, n_events, n_intervals,
      |  round(CAST(w_us AS DOUBLE) / 1e6, 3) + 0.0 AS span_s,
      |  round(CAST(vw AS DOUBLE)
      |    / nullif(CAST(w_us AS DOUBLE), 0e0) / 1e2, 6) + 0.0 AS twap
      |FROM agg""".stripMargin
}
