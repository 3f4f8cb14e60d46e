package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Burstiness / overdispersion of event arrivals — is a series
  * Poisson-steady or does it arrive in bursts? The Fano factor
  * (var/mean of daily counts; 1 = Poisson, ≫ 1 = bursty) and the
  * Goh–Barabási burstiness coefficient B = (σ−μ)/(σ+μ) ∈ [−1, 1).
  * The arrival-process health metric q118's cadence (per-entity gaps)
  * and q111's ACF (correlation structure) both presuppose: an
  * alerting pipeline needs to know its baseline dispersion before
  * thresholding daily volumes.
  *
  * Semantics: daily counts per series over the series' OWN active
  * span (first to last day inclusive) — zero-count days inside the
  * span are part of the distribution (dropping them biases Fano
  * toward 1), accounted WITHOUT generating zero rows via the cleared
  * identity D·Σ(c−μ)² = D·S₂ − S₁² with μ = S₁/D over the D span
  * days (S₁/S₂ from observed cells only, exact — absent days add 0).
  *
  * Exactness: all sums are exact integers; DECIMAL(38,0) products;
  * σ enters once via one shared-text sqrt of an exact integer ratio;
  * Fano = (D·S₂ − S₁²)/(D·S₁) is integer-cleared before its single
  * divide.
  *
  * Plan/scale: one map-side-combined (series, day) cell aggregate,
  * one series rollup — no window, no join, fact scanned once.
  */
object Burstiness {

  /** Per-series daily-count dispersion over an event frame. */
  def dailyDispersion(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    events
      .select(col(keyCol).as("k"),
        expr(s"CAST(datediff(CAST($tsCol AS DATE), DATE'1970-01-01') AS BIGINT)")
          .as("d"))
      .groupBy("k", "d")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .groupBy("k")
      .agg(
        expr("CAST(max(d) - min(d) + 1 AS BIGINT)").as("span_days"),
        expr("CAST(count(1) AS BIGINT)").as("active_days"),
        expr("CAST(sum(c) AS BIGINT)").as("s1"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))").as("s2"))
      .selectExpr("k", "span_days", "active_days", "s1 AS n_events",
        "CAST(CAST(span_days AS DECIMAL(38,0)) * s2" +
          " - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE) AS num",
        "CAST(span_days AS DOUBLE) AS dd", "CAST(s1 AS DOUBLE) AS s1d")
      .selectExpr("k", "span_days", "active_days", "n_events",
        "round(s1d / dd, 4) + 0.0 AS mean_daily",
        "round(num / (dd * s1d), 4) + 0.0 AS fano",
        "round((sqrt(num) - s1d) / nullif(sqrt(num) + s1d, 0e0), 4) + 0.0" +
          " AS burstiness")
  }

  /** q133: arrival dispersion per event type. */
  def eventTypeDispersion(spark: SparkSession, dir: String): DataFrame =
    dailyDispersion(Tables.events(spark, dir), "event_type", "ts")
      .withColumnRenamed("k", "event_type")

  val eventTypeDispersionSql: String =
    """WITH cells AS (
      |  SELECT event_type AS k,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS d,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |agg AS (
      |  SELECT k,
      |    CAST(max(d) - min(d) + 1 AS BIGINT) AS span_days,
      |    CAST(count(*) AS BIGINT) AS active_days,
      |    CAST(sum(c) AS BIGINT) AS s1,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
      |  FROM cells GROUP BY 1),
      |num AS (
      |  SELECT k, span_days, active_days, s1 AS n_events,
      |    CAST(CAST(span_days AS HUGEINT) * s2
      |      - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS num,
      |    CAST(span_days AS DOUBLE) AS dd, CAST(s1 AS DOUBLE) AS s1d
      |  FROM agg)
      |SELECT k AS event_type, span_days, active_days, n_events,
      |  round(s1d / dd, 4) + 0.0 AS mean_daily,
      |  round(num / (dd * s1d), 4) + 0.0 AS fano,
      |  round((sqrt(num) - s1d) / nullif(sqrt(num) + s1d, 0e0), 4) + 0.0
      |    AS burstiness
      |FROM num""".stripMargin
}
