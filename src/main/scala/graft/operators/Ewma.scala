package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exponentially-weighted moving average per entity — the "current
  * level" smoother behind monitoring dashboards and feature stores:
  * the latest reading matters most, history decays geometrically.
  * Complements q44's equal-weight rolling stats (which lag level
  * shifts) and q105's CUSUM (which detects them): EWMA *tracks* them.
  *
  * Semantics: truncated adjusted EWMA over each user's last K events
  * by time — ewma = Σ_{j=0..K-1} w_j·v_{n-j} / Σ w_j with w_j = α·
  * (1−α)^j and the tail beyond K dropped (the standard finite-memory
  * form; with α = 1/2 the truncation error after K=20 terms is
  * < 2⁻²⁰ of the oldest value — below the output rounding).
  *
  * Exactness (why α is FIXED at 1/2): every weight is a dyadic
  * rational 2⁻⁽ʲ⁺¹⁾, values enter as integer ten-thousandths, so each
  * term value·2⁻ʲ is an exact double (≤ 31+20 significant bits) and
  * the ≤ K-term sum is exact REGARDLESS of addition order — the one
  * inexact step is the single final divide, identical shared text in
  * both engines. An arbitrary-α EWMA would sum non-representable
  * terms whose total depends on engine sum order.
  *
  * Plan/scale: one per-user ordered window (row_number) + one keyed
  * aggregate — activity-bounded partitions, the q51/q118
  * precondition; no global window, no self-join. At 100 TB this is
  * one shuffle by user carrying (user, value, rank ≤ K) rows.
  */
object Ewma {

  /** Per-key truncated EWMA(α=1/2, last `k` events) of `valueCol`
    * ordered by (`tsCol`, `tieCol`) descending. */
  def ewmaLast(events: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, valueCol: String, k: Int = 20): DataFrame = {
    require(k >= 1 && k <= 30, s"k must be in [1,30] for exact dyadic sums, got $k")
    events
      .select(col(keyCol).as("k"), col(tsCol).as("ts"), col(tieCol).as("tie"),
        expr(s"CAST(floor(coalesce($valueCol, 0e0) * 10000) AS BIGINT)").as("vi"))
      .withColumn("j", expr("row_number() OVER" +
        " (PARTITION BY k ORDER BY ts DESC, tie DESC) - 1"))
      .groupBy("k")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_events"),
        expr("max(CASE WHEN j = 0 THEN vi END)").as("last_vi"),
        expr(s"sum(CASE WHEN j < $k THEN CAST(vi AS DOUBLE) * power(5e-1, j) END)")
          .as("ws"),
        expr(s"sum(CASE WHEN j < $k THEN power(5e-1, j) END)").as("wn"))
      .selectExpr("k", "n_events",
        "round(CAST(last_vi AS DOUBLE) / 10000, 4) + 0.0 AS last_value",
        "round(ws / wn / 10000, 4) + 0.0 AS ewma")
  }

  /** q124: per-user EWMA level of event values — who is trending
    * where now, weighted to the recent past. */
  def userEwma(spark: SparkSession, dir: String): DataFrame =
    ewmaLast(Tables.events(spark, dir), "user_id", "ts", "event_id", "value")
      .withColumnRenamed("k", "user_id")

  val userEwmaSql: String =
    """WITH ev AS (
      |  SELECT user_id AS k,
      |    CAST(floor(coalesce(value, 0e0) * 10000) AS BIGINT) AS vi,
      |    row_number() OVER
      |      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) - 1 AS j
      |  FROM events)
      |SELECT k AS user_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(CAST(max(CASE WHEN j = 0 THEN vi END) AS DOUBLE) / 10000,
      |    4) + 0.0 AS last_value,
      |  round(sum(CASE WHEN j < 20 THEN CAST(vi AS DOUBLE) * power(5e-1, j) END)
      |    / sum(CASE WHEN j < 20 THEN power(5e-1, j) END) / 10000,
      |    4) + 0.0 AS ewma
      |FROM ev GROUP BY 1""".stripMargin
}
