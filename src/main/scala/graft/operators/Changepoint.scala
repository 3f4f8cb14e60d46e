package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** CUSUM changepoint / mean-shift detection — the sequential monitor
  * that catches a SUSTAINED small shift long before a per-point fence
  * (q71's MAD, q8's z) fires: S⁺_t = max(0, S⁺_{t−1} + (x_t − μ₀ − k))
  * accumulates evidence of an upward shift, S⁻ the mirror, alarm when
  * either exceeds h. The monitoring layer q86/q99/18m's
  * distribution-level checks complement with point-in-time sequential
  * power.
  *
  * Window form: the clamped recursion is NOT a recursion at all —
  * S⁺_t = P_t − min(0, min_{j≤t} P_j) for the plain prefix sum
  * P_t = Σ(x_i − μ₀ − k), and S⁻_t = max(0, max_{j≤t} Q_j) − Q_t for
  * Q_t = Σ(x_i − μ₀ + k). Two cumulative windows per side, no
  * iteration, no state.
  *
  * Exactness: x is snapped to cents per row by shared text; μ₀, k, h
  * are integer-cent SPECIFICATIONS (CUSUM monitors against a target —
  * the parameters are the contract, not estimates), so every prefix
  * sum, running extremum, and comparison is EXACT BIGINT arithmetic —
  * no doubles anywhere until the display columns. The order
  * (ts, tieCol) must be a total order for prefix sums to be
  * well-defined; rows identical in both sort keys commute (equal
  * contributions), so the sequence is engine-independent.
  *
  * Scale: the per-group ordered window is row-bounded BY DESIGN — a
  * sequential statistic is a fold over the series. At 100 TB,
  * pre-aggregate to time buckets first (hour/day sums — the q47
  * quantize-first discipline applied to time), which both bounds the
  * window and is what a monitoring chart plots anyway; the operator
  * is agnostic to whether rows are events or buckets. */
object Changepoint {

  /** Per-row CUSUM frame: input plus exact-cent s_up/s_dn and the
    * alarm flag/direction. `tieCol` breaks ts ties to a total order. */
  def cusum(df: DataFrame, groupCol: String, tsCol: String, tieCol: String,
      valueCol: String, targetCents: Long, kCents: Long,
      hCents: Long): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(tsCol).as("ts"),
        col(tieCol).as("tie"),
        expr(s"CAST(floor($valueCol * 1e2) AS BIGINT)").as("xc"))
      .withColumn("p", sum(expr(s"xc - ${targetCents + kCents}")).over(w))
      .withColumn("q", sum(expr(s"xc - ${targetCents - kCents}")).over(w))
      .withColumn("minp", min("p").over(w))
      .withColumn("maxq", max("q").over(w))
      // least/greatest fold in the virtual P_0 = 0 prefix; operands
      // are non-null here, so the NULL-skipping semantics are moot
      .withColumn("s_up", expr("p - least(minp, 0L)"))
      .withColumn("s_dn", expr("greatest(maxq, 0L) - q"))
      .withColumn("alarm", expr(s"s_up > $hCents OR s_dn > $hCents"))
      .withColumn("dir", expr(
        s"CASE WHEN s_up > $hCents AND s_dn > $hCents THEN 'both'" +
          s" WHEN s_up > $hCents THEN 'up'" +
          s" WHEN s_dn > $hCents THEN 'down' END"))
      .select("g", "ts", "tie", "xc", "s_up", "s_dn", "alarm", "dir")
  }

  /** q105 parameters: the events feed is specified at mean 50.00 with
    * a ±15.00 allowance and a 200.00 decision interval. */
  val Target = 5000L; val K = 1500L; val H = 20000L

  /** q105: per-type CUSUM summary over the events stream —
    * (event_type, n_rows, n_up, n_down, max_s_up, max_s_dn,
    * first_up_ts, first_down_ts). The registered surface is the
    * summary (alarm rows are dense when a feed genuinely drifts — the
    * per-row frame is the [[cusum]] API). */
  def eventsCusum(spark: SparkSession, dir: String): DataFrame =
    cusum(Tables.events(spark, dir), "event_type", "ts", "event_id",
      "value", Target, K, H)
      .groupBy(col("g").as("event_type"))
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(CASE WHEN dir IN ('up', 'both') THEN 1 ELSE 0 END) AS BIGINT)").as("n_up"),
        expr("CAST(sum(CASE WHEN dir IN ('down', 'both') THEN 1 ELSE 0 END) AS BIGINT)").as("n_down"),
        expr("round(CAST(max(s_up) AS DOUBLE) / 1e2, 2) + 0.0").as("max_s_up"),
        expr("round(CAST(max(s_dn) AS DOUBLE) / 1e2, 2) + 0.0").as("max_s_dn"),
        expr("min(CASE WHEN dir IN ('up', 'both') THEN ts END)").as("first_up_ts"),
        expr("min(CASE WHEN dir IN ('down', 'both') THEN ts END)").as("first_down_ts"))

  val eventsCusumSql: String =
    s"""WITH x AS (
       |  SELECT event_type AS g, ts, event_id AS tie,
       |    CAST(floor(value * 1e2) AS BIGINT) AS xc
       |  FROM events WHERE value IS NOT NULL),
       |p AS (
       |  SELECT g, ts, tie,
       |    sum(xc - ${Target + K}) OVER w AS p,
       |    sum(xc - ${Target - K}) OVER w AS q
       |  FROM x WINDOW w AS (PARTITION BY g ORDER BY ts, tie
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |s AS (
       |  SELECT g, ts,
       |    p - least(min(p) OVER w, 0) AS s_up,
       |    greatest(max(q) OVER w, 0) - q AS s_dn
       |  FROM p WINDOW w AS (PARTITION BY g ORDER BY ts, tie
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |d AS (
       |  SELECT g, ts, s_up, s_dn,
       |    CASE WHEN s_up > $H AND s_dn > $H THEN 'both'
       |      WHEN s_up > $H THEN 'up'
       |      WHEN s_dn > $H THEN 'down' END AS dir
       |  FROM s)
       |SELECT g AS event_type,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN dir IN ('up', 'both') THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       |  CAST(sum(CASE WHEN dir IN ('down', 'both') THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       |  round(CAST(max(s_up) AS DOUBLE) / 1e2, 2) + 0.0 AS max_s_up,
       |  round(CAST(max(s_dn) AS DOUBLE) / 1e2, 2) + 0.0 AS max_s_dn,
       |  min(CASE WHEN dir IN ('up', 'both') THEN ts END) AS first_up_ts,
       |  min(CASE WHEN dir IN ('down', 'both') THEN ts END) AS first_down_ts
       |FROM d GROUP BY 1""".stripMargin
}
