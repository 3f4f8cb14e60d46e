package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Kaplan–Meier survival curves — the nonparametric estimate of
  * "probability a subject is still alive at time t" under RIGHT
  * CENSORING: subjects still active when observation ends contribute
  * their time-at-risk without biasing the estimate the way a naive
  * "mean lifetime of the churned" does (that conditions on dying,
  * q51's cohort grid shows retention but can't separate censoring
  * from survival). The churn-analysis deliverable.
  *
  * Estimator: at each distinct event time t with dₜ events out of nₜ
  * at risk (nₜ = subjects whose duration ≥ t; censored AT t count as
  * at risk — the standard events-before-censorings convention),
  * S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ).
  *
  * Exactness: the product is a cumulative SUM of per-step
  * ln((nᵢ−dᵢ)/nᵢ) — each argument a ratio of exact BIGINTs, each ln
  * output snapped to the 1e-9 nano-nat grid (engine ln differs in
  * the last ulp — the q103 discipline), summed as exact integers;
  * exp at display is itself 1e-9-snapped before the round-6 (the q94
  * exp discipline). A step where every remaining subject dies
  * (d = n, ln 0) contributes a −1e18 nano-nat sentinel: exp
  * underflows to exactly 0.0 in both engines, and at most one such
  * step can exist per group (n_risk hits zero after it).
  *
  * Plan/scale: observations → (group, duration) CELLS in one keyed
  * aggregate; the cumulative windows run over cells per group —
  * bounded by the DURATION RANGE (calendar days here), never by
  * subject count. Group totals are dimension-grade and broadcast
  * back. */
object Survival {

  /** KM curve from an observation frame with columns (g, dur, event):
    * one subject per row, integer duration, event = 1 (observed) /
    * 0 (right-censored). Returns one row per (group, event time). */
  def kaplanMeier(obs: DataFrame): DataFrame = {
    val cells = obs.groupBy("g", "dur")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("cnt_all"),
        expr("CAST(sum(event) AS BIGINT)").as("cnt_event"))
    val totals = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt_all) AS BIGINT)").as("n_total"))
    val wBelow = Window.partitionBy("g").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("g").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .join(broadcast(totals), "g")
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("cnt_all").over(wBelow), lit(0L)))
      .filter(col("cnt_event") > 0)
      .withColumn("term", expr(
        "CASE WHEN cnt_event < n_risk THEN CAST(floor(" +
          "ln(CAST(n_risk - cnt_event AS DOUBLE) / CAST(n_risk AS DOUBLE))" +
          " * 1e9 + 5e-1) AS BIGINT)" +
          " ELSE CAST(-1000000000000000000 AS BIGINT) END"))
      .withColumn("cum_ln", sum("term").over(wCum))
      .selectExpr("g", "dur AS t_days", "n_risk",
        "cnt_event AS d_events", "cnt_all - cnt_event AS c_censored",
        "round(CAST(floor(exp(CAST(cum_ln AS DOUBLE) / 1e9) * 1e9 + 5e-1)" +
          " AS DOUBLE) / 1e9, 6) + 0.0 AS survival")
  }

  /** Nelson–Aalen cumulative hazard — the INTEGRAL companion of the
    * KM product: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, the expected number of events
    * a subject still at risk would have accumulated by t. Where KM
    * answers "what fraction survives", NA answers "how much hazard has
    * piled up" — the natural scale for comparing hazard SLOPES between
    * segments and the sufficient statistic the q159 log-rank weights.
    * Also emits the Fleming–Harrington survival exp(−H) (the
    * small-risk-set alternative to KM) and the hazard's standard error
    * from the classical variance Σ dᵢ/nᵢ².
    *
    * Exactness: each step dᵢ/nᵢ is ONE division of exact BIGINTs,
    * snapped to the 1e-9 nano grid and summed as integers (order-free
    * — the q110 ln discipline applied to the hazard scale); the
    * variance steps use a 1e12 grid (terms ≤ 1, spine length × 1e12
    * stays far under BIGINT). sqrt is IEEE-correctly-rounded (no snap
    * needed); exp is snapped before display (the q94 discipline).
    *
    * Plan/scale: identical shape to [[kaplanMeier]] — one keyed cell
    * aggregate, duration-spine-bounded windows, broadcast totals. */
  def nelsonAalen(obs: DataFrame): DataFrame = {
    val cells = obs.groupBy("g", "dur")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("cnt_all"),
        expr("CAST(sum(event) AS BIGINT)").as("cnt_event"))
    val totals = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt_all) AS BIGINT)").as("n_total"))
    val wBelow = Window.partitionBy("g").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("g").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .join(broadcast(totals), "g")
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("cnt_all").over(wBelow), lit(0L)))
      .filter(col("cnt_event") > 0)
      .withColumn("h_step", expr(
        "CAST(floor(CAST(cnt_event AS DOUBLE) / CAST(n_risk AS DOUBLE)" +
          " * 1e9 + 5e-1) AS BIGINT)"))
      .withColumn("v_step", expr(
        "CAST(floor(CAST(cnt_event AS DOUBLE)" +
          " / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))" +
          " * 1e12 + 5e-1) AS BIGINT)"))
      .withColumn("cum_h", sum("h_step").over(wCum))
      .withColumn("cum_v", sum("v_step").over(wCum))
      .selectExpr("g", "dur AS t_days", "n_risk",
        "cnt_event AS d_events",
        "round(CAST(cum_h AS DOUBLE) / 1e9, 6) + 0.0 AS cum_hazard",
        "round(sqrt(CAST(cum_v AS DOUBLE) / 1e12), 6) + 0.0 AS se_hazard",
        "round(CAST(floor(exp(-(CAST(cum_h AS DOUBLE) / 1e9)) * 1e9 + 5e-1)" +
          " AS DOUBLE) / 1e9, 6) + 0.0 AS fh_survival")
  }

  /** q178: per-segment cumulative churn hazard on the SAME observation
    * frame as q110 (duration between first and last order, 90-day
    * censor anchor) — one operator family, two complementary scales. */
  def segmentHazard(spark: SparkSession, dir: String): DataFrame =
    nelsonAalen(segmentObs(spark, dir)).withColumnRenamed("g", "c_mktsegment")

  val segmentHazardSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey,
      |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
      |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
      |mx AS (SELECT max(last_d) AS mx FROM per_cust),
      |obs AS (
      |  SELECT c_mktsegment AS g, last_d - first_d AS dur,
      |    CASE WHEN last_d < mx - 90 THEN 1 ELSE 0 END AS event
      |  FROM per_cust CROSS JOIN mx
      |  JOIN customer ON o_custkey = c_custkey),
      |cells AS (
      |  SELECT g, dur, CAST(count(*) AS BIGINT) AS cnt_all,
      |    CAST(sum(event) AS BIGINT) AS cnt_event
      |  FROM obs GROUP BY 1, 2),
      |tot AS (SELECT g, CAST(sum(cnt_all) AS BIGINT) AS n_total
      |  FROM cells GROUP BY 1),
      |risk AS (
      |  SELECT cells.g, dur, cnt_all, cnt_event,
      |    CAST(n_total - coalesce(sum(cnt_all) OVER (PARTITION BY cells.g
      |      ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) AS BIGINT) AS n_risk
      |  FROM cells JOIN tot ON cells.g = tot.g),
      |steps AS (
      |  SELECT g, dur, cnt_event, n_risk,
      |    CAST(floor(CAST(cnt_event AS DOUBLE) / CAST(n_risk AS DOUBLE)
      |      * 1e9 + 5e-1) AS BIGINT) AS h_step,
      |    CAST(floor(CAST(cnt_event AS DOUBLE)
      |      / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))
      |      * 1e12 + 5e-1) AS BIGINT) AS v_step
      |  FROM risk WHERE cnt_event > 0),
      |cum AS (
      |  SELECT g, dur, cnt_event, n_risk,
      |    sum(h_step) OVER (PARTITION BY g ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_h,
      |    sum(v_step) OVER (PARTITION BY g ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v
      |  FROM steps)
      |SELECT g AS c_mktsegment, dur AS t_days, n_risk,
      |  cnt_event AS d_events,
      |  round(CAST(cum_h AS DOUBLE) / 1e9, 6) + 0.0 AS cum_hazard,
      |  round(sqrt(CAST(cum_v AS DOUBLE) / 1e12), 6) + 0.0 AS se_hazard,
      |  round(CAST(floor(exp(-(CAST(cum_h AS DOUBLE) / 1e9)) * 1e9 + 5e-1)
      |    AS DOUBLE) / 1e9, 6) + 0.0 AS fh_survival
      |FROM cum""".stripMargin

  /** The shared q110/q178 observation frame: duration = days between a
    * customer's first and last order; a customer whose last order falls
    * within 90 days of the dataset's final order date is right-censored
    * (still active as far as the data can tell), otherwise the quiet
    * spell counts as an observed churn. */
  private def segmentObs(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
          .as("d"))
      .groupBy("o_custkey")
      .agg(min("d").as("first_d"), max("d").as("last_d"))
      // reused by the censor anchor AND the observation frame:
      // checkpoint so orders aggregates once (no CSE across frames)
      .localCheckpoint(true)
    val mx = perCust.agg(max("last_d").as("mx"))
    val obs = perCust
      .crossJoin(broadcast(mx))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g",
        "CAST(last_d - first_d AS BIGINT) AS dur",
        "CASE WHEN last_d < mx - 90 THEN 1 ELSE 0 END AS event")
    obs
  }

  /** q110: per-segment customer "lifetime" curves over [[segmentObs]]. */
  def segmentChurn(spark: SparkSession, dir: String): DataFrame =
    kaplanMeier(segmentObs(spark, dir)).withColumnRenamed("g", "c_mktsegment")

  val segmentChurnSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey,
      |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
      |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
      |mx AS (SELECT max(last_d) AS mx FROM per_cust),
      |obs AS (
      |  SELECT c_mktsegment AS g, last_d - first_d AS dur,
      |    CASE WHEN last_d < mx - 90 THEN 1 ELSE 0 END AS event
      |  FROM per_cust CROSS JOIN mx
      |  JOIN customer ON o_custkey = c_custkey),
      |cells AS (
      |  SELECT g, dur, CAST(count(*) AS BIGINT) AS cnt_all,
      |    CAST(sum(event) AS BIGINT) AS cnt_event
      |  FROM obs GROUP BY 1, 2),
      |tot AS (SELECT g, CAST(sum(cnt_all) AS BIGINT) AS n_total
      |  FROM cells GROUP BY 1),
      |risk AS (
      |  SELECT cells.g, dur, cnt_all, cnt_event,
      |    CAST(n_total - coalesce(sum(cnt_all) OVER (PARTITION BY cells.g
      |      ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) AS BIGINT) AS n_risk
      |  FROM cells JOIN tot ON cells.g = tot.g),
      |steps AS (
      |  SELECT g, dur, cnt_all, cnt_event, n_risk,
      |    CASE WHEN cnt_event < n_risk THEN CAST(floor(
      |      ln(CAST(n_risk - cnt_event AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |      * 1e9 + 5e-1) AS BIGINT)
      |      ELSE CAST(-1000000000000000000 AS BIGINT) END AS term
      |  FROM risk WHERE cnt_event > 0),
      |cum AS (
      |  SELECT g, dur, cnt_all, cnt_event, n_risk,
      |    sum(term) OVER (PARTITION BY g ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln
      |  FROM steps)
      |SELECT g AS c_mktsegment, dur AS t_days, n_risk,
      |  cnt_event AS d_events, cnt_all - cnt_event AS c_censored,
      |  round(CAST(floor(exp(CAST(cum_ln AS DOUBLE) / 1e9) * 1e9 + 5e-1)
      |    AS DOUBLE) / 1e9, 6) + 0.0 AS survival
      |FROM cum""".stripMargin
}
