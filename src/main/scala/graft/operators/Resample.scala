package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series resampling with gap fill — regularize an event stream
  * onto a fixed grid (hourly here) with last-observation-carried-
  * forward, the standard prep before window features / charting /
  * model inputs (pandas `resample().ffill()` re-expressed). Every
  * user's grid spans their own [first, last] observed hour; grid
  * hours with no events get `n_events = 0`, `is_gap = 1`, and the
  * carried value.
  *
  * Exactness: the hourly mean is fixed-point (`Σ floor(value·1e4)` as
  * exact BIGINT, the q32 technique) and the mean itself is an INTEGER
  * division of that sum (floor at 1e-4 precision) — a true-division
  * mean can land exactly on a 4-decimal rounding tie, where the two
  * engines' `round` implementations disagree. The final `/1e4` of an
  * integer can never produce a tie, so the LOCF-carried value is
  * bit-identical on both engines. Hours whose events all carry null
  * values yield a null observation, which LOCF skips (IGNORE NULLS on
  * both engines).
  *
  * Scale shape: one (user, hour) aggregate + one per-user bounds
  * aggregate + a `sequence` explode of the grid + a left join + ONE
  * per-user ordered window (O(1) running state). Grid row count is
  * Σ user-spans — bounded by time horizon × active users, not by
  * event count; the window partitions by user, so no global sort.
  *
  * VALUE-DOMAIN ASSUMPTION: the +count·1e10 positive shift (below)
  * reconciles Spark's truncating `div` with DuckDB's flooring `//`
  * ONLY while the shifted numerator stays non-negative, i.e. while
  * the per-hour mean of floor(value·1e4) is ≥ −1e10 — values must
  * exceed −1e6. The events feed is bounded far inside that (|value|
  * < 1e4); callers resampling a different feed with more-negative
  * values must re-size the shift constant (same constant in BOTH the
  * Spark chain and the SQL twin) from the data's min. */
object Resample {

  /** q72: (user_id, hour, n_events, value_filled, is_gap). */
  def hourlyLocf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("value"))
    val hourly = ev.groupBy("user_id", "hour").agg(
      count(lit(1)).as("n_obs"),
      // the +n·1e10 shift keeps the numerator positive: Spark `div`
      // truncates toward zero while DuckDB `//` floors, and they only
      // agree on non-negative operands
      expr("round(CAST((sum(CAST(floor(value * 10000) AS BIGINT))" +
        " + count(value) * 10000000000) div count(value)" +
        " - 10000000000 AS DOUBLE) / 10000.0, 4) + 0.0").as("value_obs"))
    val grid = ev.groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        last(col("value_obs"), ignoreNulls = true).over(w).as("value_filled"),
        (col("n_obs").isNull).cast("int").as("is_gap"))
  }

  val hourlyLocfSql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, value FROM events),
      |hourly AS (
      |  SELECT user_id, hour, count(*) AS n_obs,
      |    round(CAST((sum(CAST(floor(value * 10000) AS BIGINT))
      |          + count(value) * 10000000000) // count(value)
      |          - 10000000000 AS DOUBLE) / 10000.0, 4) + 0.0 AS value_obs
      |  FROM ev GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM (SELECT user_id, min(hour) AS h0, max(hour) AS h1
      |        FROM ev GROUP BY 1))
      |SELECT g.user_id, g.hour,
      |  coalesce(h.n_obs, 0) AS n_events,
      |  last_value(h.value_obs IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
      |  CAST(h.n_obs IS NULL AS INT) AS is_gap
      |FROM grid g LEFT JOIN hourly h
      |  ON g.user_id = h.user_id AND g.hour = h.hour""".stripMargin
}
