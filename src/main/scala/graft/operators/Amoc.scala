package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** At-most-one-changepoint (AMOC) mean-shift detection per series —
  * WHERE did the level break? q105's CUSUM raises the alarm online;
  * the retrospective question ("on which day did the regime change,
  * and from what mean to what mean") is the argmax of the scaled
  * CUSUM statistic Q(k) = (n·S_k − k·S)² / (k·(n−k)) over every
  * prefix k of the ordered series — the classic single-changepoint
  * estimator (binary segmentation's first and usually decisive step).
  *
  * Exactness: daily values enter as integer ten-thousandth sums;
  * a = n·S_k − k·S and w = k·(n−k) are EXACT integers (DECIMAL 38),
  * and the election statistic q = (a/10⁴)²/w is the identical
  * shared-text double chain in both engines — exact integer → double
  * casts are correctly rounded IEEE in Spark and DuckDB, so both
  * engines rank bit-identical doubles; ties (including any produced
  * by double rounding) elect the earliest day, identically. The
  * decimal-division route was REJECTED: Spark and DuckDB derive
  * different result scales for DECIMAL/DECIMAL, so the quotient is
  * not a cross-engine value. Reported means are shared-text divides
  * off the exact integers.
  *
  * Plan/scale: one (series, day) cell aggregate, one per-series
  * ordered cumulative window over day cells (span-bounded
  * partitions), one max_by election per series — no self-join, no
  * O(n²) split scan.
  */
object Amoc {

  /** Per-series single mean-shift election over daily value sums. */
  def meanShift(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    events
      .select(col(keyCol).as("k"),
        expr(s"CAST(datediff(CAST($tsCol AS DATE), DATE'1970-01-01') AS BIGINT)")
          .as("d"),
        expr(s"CAST(floor(coalesce($valueCol, 0e0) * 10000) AS BIGINT)").as("vi"))
      .groupBy("k", "d")
      .agg(expr("CAST(sum(vi) AS BIGINT)").as("cv"))
      // ordered prefix over day cells + whole-series totals, one
      // projection per layer so same-spec windows collapse (q126 shape)
      .selectExpr("k", "d", "cv",
        "CAST(sum(cv) OVER (PARTITION BY k) AS BIGINT) AS s",
        "CAST(count(1) OVER (PARTITION BY k) AS BIGINT) AS n",
        "CAST(sum(cv) OVER (PARTITION BY k ORDER BY d" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk",
        "row_number() OVER (PARTITION BY k ORDER BY d) AS rk")
      .filter(col("rk") < col("n")) // k = n is not a split
      .selectExpr("k", "d", "s", "n", "rk", "sk",
        "CAST(CAST(n AS DECIMAL(38,0)) * sk" +
          " - CAST(rk AS DECIMAL(38,0)) * s AS DECIMAL(38,0)) AS a",
        "CAST(CAST(rk AS DECIMAL(38,0)) * (n - rk) AS DECIMAL(38,0)) AS w")
      .selectExpr("k", "d", "s", "n", "rk", "sk",
        "(CAST(a AS DOUBLE) / 1e4) * (CAST(a AS DOUBLE) / 1e4)" +
          " / CAST(w AS DOUBLE) AS q")
      .withColumn("pick", expr(
        "row_number() OVER (PARTITION BY k ORDER BY q DESC, d)"))
      .filter(col("pick") === 1)
      .selectExpr("k", "CAST(n AS BIGINT) AS n_days",
        "d AS cp_day",
        "round(CAST(sk AS DOUBLE) / CAST(rk AS DOUBLE) / 10000, 4) + 0.0" +
          " AS mean_before",
        "round(CAST(s - sk AS DOUBLE) / CAST(n - rk AS DOUBLE) / 10000," +
          " 4) + 0.0 AS mean_after",
        "round(q / CAST(n AS DOUBLE), 4) + 0.0 AS score")
  }

  /** q134: where each event type's daily value level broke. */
  def eventTypeShift(spark: SparkSession, dir: String): DataFrame =
    meanShift(Tables.events(spark, dir), "event_type", "ts", "value")
      .withColumnRenamed("k", "event_type")

  val eventTypeShiftSql: String =
    """WITH cells AS (
      |  SELECT event_type AS k,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS d,
      |    CAST(sum(CAST(floor(coalesce(value, 0e0) * 10000) AS BIGINT))
      |      AS BIGINT) AS cv
      |  FROM events GROUP BY 1, 2),
      |pref AS (
      |  SELECT k, d, cv,
      |    CAST(sum(cv) OVER (PARTITION BY k) AS BIGINT) AS s,
      |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
      |    CAST(sum(cv) OVER (PARTITION BY k ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk,
      |    row_number() OVER (PARTITION BY k ORDER BY d) AS rk
      |  FROM cells),
      |scored AS (
      |  SELECT k, d, s, n, rk, sk,
      |    (CAST(CAST(n AS HUGEINT) * sk - CAST(rk AS HUGEINT) * s AS DOUBLE)
      |       / 1e4)
      |    * (CAST(CAST(n AS HUGEINT) * sk - CAST(rk AS HUGEINT) * s AS DOUBLE)
      |       / 1e4)
      |    / CAST(CAST(rk AS HUGEINT) * (n - rk) AS DOUBLE) AS q
      |  FROM pref WHERE rk < n),
      |best AS (
      |  SELECT k, d, s, n, rk, sk, q,
      |    row_number() OVER (PARTITION BY k ORDER BY q DESC, d) AS pick
      |  FROM scored)
      |SELECT k AS event_type, CAST(n AS BIGINT) AS n_days,
      |  d AS cp_day,
      |  round(CAST(sk AS DOUBLE) / CAST(rk AS DOUBLE) / 10000, 4) + 0.0
      |    AS mean_before,
      |  round(CAST(s - sk AS DOUBLE) / CAST(n - rk AS DOUBLE) / 10000,
      |    4) + 0.0 AS mean_after,
      |  round(q / CAST(n AS DOUBLE), 4) + 0.0 AS score
      |FROM best WHERE pick = 1""".stripMargin
}
