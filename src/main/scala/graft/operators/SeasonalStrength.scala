package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Seasonal strength — how much of a series' variance the weekly
  * cycle actually EXPLAINS: η² = SSB/SST of the day-of-week factor
  * (one-way ANOVA effect size over the q127 profile). q127 prints
  * the cycle's shape and q111's ACF detects that one exists; this is
  * the scalar that says whether the like-weekday correction q86's
  * drift monitor wants is load-bearing (η² → 1) or cosmetic (→ 0).
  *
  * Semantics: events grouped by (series, dow) with dow = (epoch_days
  * + 4) mod 7 (q127's integer convention); η² = 1 − SSW/SST from the
  * one-way decomposition; SST = 0 (constant series) → NULL via
  * nullif.
  *
  * Exactness: per-cell (n, Σv, Σv²) in integer ten-thousandths; the
  * cleared identities n·SSW = Σ_d (n·q_d) − Σ_d (n·s_d²/n_d)… are
  * avoided — instead both SS enter as the shared-text double chain
  * SS = q − s²/n per cell and per total off exact integers cast
  * once (correctly-rounded IEEE both engines, the q134 rule), so the
  * single η² divide sees bit-identical operands.
  *
  * Plan/scale: ONE map-side-combined (series, dow) cell aggregate
  * (≤ 7 rows/series) + one rollup — no window, no join, fact scanned
  * once.
  */
object SeasonalStrength {

  /** Per-series day-of-week η² over an event frame. */
  def dowStrength(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    events
      .select(col(keyCol).as("k"),
        expr(s"(CAST(datediff(CAST($tsCol AS DATE), DATE'1970-01-01') AS BIGINT)" +
          " + 4) % 7").as("dow"),
        expr(s"CAST(floor(coalesce($valueCol, 0e0) * 10000) AS BIGINT)").as("vi"))
      .groupBy("k", "dow")
      .agg(expr("CAST(count(1) AS BIGINT)").as("nd"),
        expr("CAST(sum(vi) AS BIGINT)").as("sd"),
        expr("CAST(sum(CAST(vi AS DECIMAL(38,0)) * vi) AS DECIMAL(38,0))")
          .as("qd"))
      .groupBy("k")
      .agg(
        expr("CAST(sum(nd) AS BIGINT)").as("n_events"),
        expr("CAST(count(1) AS BIGINT)").as("n_dows"),
        expr("CAST(sum(sd) AS BIGINT)").as("s"),
        expr("CAST(sum(qd) AS DECIMAL(38,0))").as("q"),
        // within-group SS summed across cells, all in one pass:
        // SSW = Σ_d (q_d − s_d²/n_d). Each per-cell term is the same
        // shared-text double in both engines, but a SUM of doubles is
        // order-sensitive — so each term is SNAPPED to an integer grid
        // first (the lnSnap rule) and only integers are summed; the
        // 1e4-unit grid is ~10 orders below the terms' magnitude
        expr("sum(CAST(floor((CAST(qd AS DOUBLE)" +
          " - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE))" +
          " / 1e4 + 5e-1) AS DECIMAL(38,0))) * 1e4").as("ssw"))
      .selectExpr("k", "n_events", "n_dows",
        "CAST(q AS DOUBLE)" +
          " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n_events AS DOUBLE)" +
          " AS sst", "ssw")
      .selectExpr("k", "n_events", "n_dows",
        "round(sst / 1e8 / CAST(n_events AS DOUBLE), 4) + 0.0 AS variance",
        "round(1.0 - ssw / nullif(sst, 0e0), 6) + 0.0 AS eta_sq")
  }

  /** q139: is each event type's weekly cycle load-bearing? */
  def eventTypeStrength(spark: SparkSession, dir: String): DataFrame =
    dowStrength(Tables.events(spark, dir), "event_type", "ts", "value")
      .withColumnRenamed("k", "event_type")

  val eventTypeStrengthSql: String =
    """WITH cells AS (
      |  SELECT event_type AS k,
      |    (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7
      |      AS dow,
      |    CAST(count(*) AS BIGINT) AS nd,
      |    CAST(sum(CAST(floor(coalesce(value, 0e0) * 10000) AS BIGINT))
      |      AS BIGINT) AS sd,
      |    CAST(sum(CAST(CAST(floor(coalesce(value, 0e0) * 10000) AS BIGINT)
      |        AS HUGEINT)
      |      * CAST(floor(coalesce(value, 0e0) * 10000) AS BIGINT)) AS HUGEINT)
      |      AS qd
      |  FROM events GROUP BY 1, 2),
      |rolled AS (
      |  SELECT k,
      |    CAST(sum(nd) AS BIGINT) AS n_events,
      |    CAST(count(*) AS BIGINT) AS n_dows,
      |    CAST(sum(sd) AS BIGINT) AS s,
      |    CAST(sum(qd) AS HUGEINT) AS q,
      |    sum(CAST(floor((CAST(qd AS DOUBLE)
      |      - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE))
      |      / 1e4 + 5e-1) AS HUGEINT)) * 1e4 AS ssw
      |  FROM cells GROUP BY 1),
      |ss AS (
      |  SELECT k, n_events, n_dows,
      |    CAST(q AS DOUBLE)
      |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n_events AS DOUBLE)
      |      AS sst, ssw
      |  FROM rolled)
      |SELECT k AS event_type, n_events, n_dows,
      |  round(sst / 1e8 / CAST(n_events AS DOUBLE), 4) + 0.0 AS variance,
      |  round(1.0 - ssw / nullif(sst, 0e0), 6) + 0.0 AS eta_sq
      |FROM ss""".stripMargin
}
