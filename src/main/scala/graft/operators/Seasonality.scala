package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Day-of-week seasonal profile per series — the first question asked
  * of any event stream ("is Sunday actually quieter?") and the
  * denominator every anomaly monitor needs before it can call a dip
  * abnormal. Complements q111's ACF (which detects that a weekly
  * cycle EXISTS) by producing the cycle's actual shape, and q86's
  * drift monitor (which should compare like-weekday to like-weekday).
  *
  * Semantics: for each (series, day-of-week): event count, share of
  * the series' events, and the seasonal index — mean(value | series,
  * dow) / mean(value | series), > 1 meaning this weekday runs hot.
  *
  * Exactness: day-of-week is computed from integer epoch days as
  * (days + 4) mod 7 (1970-01-01 was a Thursday; 0 = Sunday) — pure
  * integer arithmetic identical in both engines, dodging the
  * dayofweek()/ISO-vs-US numbering swamp entirely. The index is the
  * mean RATIO rewritten as (sd·n) / (nd·s) over exact integer
  * ten-thousandth sums, multiplied DECIMAL-first (q104's discipline)
  * so both engines divide bit-identical operands once.
  *
  * Plan/scale: one map-side-combined aggregate to (series, dow)
  * cells — at most 7 rows per series — then a broadcast join of the
  * series totals derived FROM those same cells (dimension-grade, no
  * second fact scan).
  */
object Seasonality {

  /** Per-(key, day-of-week) seasonal profile of an event frame. */
  def dowProfile(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String): DataFrame = {
    // series totals via a per-key window over the ≤7-rows-per-series
    // cell frame — NOT an aggregate + join back, which would duplicate
    // the fact-scan subtree (Spark does not CSE repeated frames)
    val cells = events
      .select(col(keyCol).as("k"),
        expr(s"(CAST(datediff(CAST($tsCol AS DATE), DATE'1970-01-01') AS BIGINT)" +
          " + 4) % 7").as("dow"),
        expr(s"CAST(floor(coalesce($valueCol, 0e0) * 10000) AS BIGINT)").as("vi"))
      .groupBy("k", "dow")
      .agg(expr("CAST(count(1) AS BIGINT)").as("nd"),
        expr("CAST(sum(vi) AS BIGINT)").as("sd"))
    cells
      .withColumn("n", expr("CAST(sum(nd) OVER (PARTITION BY k) AS BIGINT)"))
      .withColumn("s", expr("CAST(sum(sd) OVER (PARTITION BY k) AS BIGINT)"))
      .selectExpr("k", "dow", "nd AS n_events",
        "round(CAST(nd AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0.0 AS share",
        "round(CAST(CAST(sd AS DECIMAL(38,0)) * n AS DOUBLE)" +
          " / nullif(CAST(CAST(nd AS DECIMAL(38,0)) * s AS DOUBLE), 0e0)," +
          " 4) + 0.0 AS seasonal_index")
  }

  /** q127: weekly shape of each event type's volume and value. */
  def eventTypeDow(spark: SparkSession, dir: String): DataFrame =
    dowProfile(Tables.events(spark, dir), "event_type", "ts", "value")
      .withColumnRenamed("k", "event_type")

  val eventTypeDowSql: String =
    """WITH cells AS (
      |  SELECT event_type AS k,
      |    (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
      |    CAST(count(*) AS BIGINT) AS nd,
      |    CAST(sum(CAST(floor(coalesce(value, 0e0) * 10000) AS BIGINT))
      |      AS BIGINT) AS sd
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT k, CAST(sum(nd) AS BIGINT) AS n, CAST(sum(sd) AS BIGINT) AS s
      |  FROM cells GROUP BY 1)
      |SELECT cells.k AS event_type, dow, nd AS n_events,
      |  round(CAST(nd AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0.0 AS share,
      |  round(CAST(CAST(sd AS HUGEINT) * n AS DOUBLE)
      |    / nullif(CAST(CAST(nd AS HUGEINT) * s AS DOUBLE), 0e0),
      |    4) + 0.0 AS seasonal_index
      |FROM cells JOIN tot ON cells.k = tot.k""".stripMargin
}
