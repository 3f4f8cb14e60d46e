package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Restricted mean survival time (RMST) — the EFFECT-SIZE member of
  * the survival deck: q110 draws the curve, q159/q161 test whether two
  * curves differ, q163 splits incidence by cause; RMST answers "HOW
  * MANY days of the first τ does a subject keep, on average" —
  * RMST(τ) = ∫₀^τ S(t) dt, the censoring-corrected mean of
  * min(lifetime, τ) (a naive mean of observed durations is biased low
  * by censoring; with NO censoring RMST is exactly that sample mean —
  * the spec's identity). Clinically the standard alternative when
  * hazards are non-proportional and a single hazard ratio misleads.
  *
  * Exactness: the KM ln-survival chain is q110 verbatim (integer
  * nano-nats, 1e-9 ln snap, −1e18 total-death sentinel); the area is
  * assembled from INTEGER NANO·DAY cells — each step contributes
  * s_prev · (tᵢ − tᵢ₋₁) with s_prev the pre-step survival on the
  * integer nano grid (⌊exp(cum_lnᵢ₋₁/1e9)·1e9 + ½⌋, exactly 1e9 at the
  * first step) and integer day gaps, and the tail past the last event
  * adds s_end · (τ − t_last) from the aggregate total — all exact Long
  * sums, order-free, bit-equal in both engines. Magnitude: ≤ 1e9·τ per
  * group (~4e11 at τ = 365) — no overflow concern. A group with NO
  * event inside the horizon has S ≡ 1 there: RMST = τ exactly,
  * emitted via the totals left join.
  *
  * Plan/scale: the q110 shape — one (group, duration) cell aggregate,
  * windows over the duration spine (calendar-bounded), group totals
  * broadcast; one extra per-group aggregate folds the area. */
object Rmst {

  /** Horizon (days): first-year retention. */
  val Horizon = 365L
  /** Censoring convention, the q110/q159 frame. */
  val CensorDays = 90

  /** Per-group RMST at `tau` days from an observation frame
    * (g, dur, event): one row per group — n subjects, events inside
    * the horizon, and rmst_days. */
  def rmst(obs: DataFrame, tau: Long = Horizon): DataFrame = {
    val cells = obs.groupBy("g", "dur")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("cnt_all"),
        expr("CAST(sum(event) AS BIGINT)").as("cnt_event"))
      .localCheckpoint(true) // totals + steps both read it (q161 note)
    val totals = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt_all) AS BIGINT)").as("n_total"))
    val wBelow = Window.partitionBy("g").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = cells
      .join(broadcast(totals), "g")
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("cnt_all").over(wBelow), lit(0L)))
      .filter(col("cnt_event") > 0 && col("dur") <= tau)
      .withColumn("term", expr(
        "CASE WHEN cnt_event < n_risk THEN CAST(floor(" +
          "ln(CAST(n_risk - cnt_event AS DOUBLE) / CAST(n_risk AS DOUBLE))" +
          " * 1e9 + 5e-1) AS BIGINT)" +
          " ELSE CAST(-1000000000000000000 AS BIGINT) END"))
      .withColumn("s_prev", expr(
        "CAST(floor(exp(CAST(" +
          "coalesce(sum(term) OVER (PARTITION BY g ORDER BY dur" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)" +
          " AS DOUBLE) / 1e9) * 1e9 + 5e-1) AS BIGINT)"))
      .withColumn("gap", expr(
        "dur - coalesce(lag(dur) OVER (PARTITION BY g ORDER BY dur), 0)"))
    val areas = steps.groupBy("g").agg(
      expr("CAST(sum(cnt_event) AS BIGINT)").as("d_horizon"),
      expr("CAST(sum(s_prev * gap) AS BIGINT)").as("area_nano"),
      expr("CAST(sum(term) AS BIGINT)").as("cum_total"),
      expr("CAST(max(dur) AS BIGINT)").as("t_last"))
    totals.join(areas, Seq("g"), "left")
      .selectExpr("g", "n_total",
        "coalesce(d_horizon, 0) AS d_horizon",
        // tail: survival after the last in-horizon event carries to τ;
        // a group with no such event keeps S ≡ 1 → exactly τ
        "coalesce(area_nano" +
          " + CAST(floor(exp(CAST(cum_total AS DOUBLE) / 1e9) * 1e9 + 5e-1)" +
          s" AS BIGINT) * ($tau - t_last), ${tau}000000000) AS rmst_nano")
      .selectExpr("g", "n_total", "d_horizon",
        "round(CAST(rmst_nano AS DOUBLE) / 1e9, 6) + 0.0 AS rmst_days")
  }

  /** q165: censoring-corrected mean retained days in the first year,
    * per market segment — the q110 observation frame. */
  def segmentRmst(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").as("d"))
      .groupBy("o_custkey")
      .agg(min("d").as("first_d"), max("d").as("last_d"))
      .localCheckpoint(true)
    val mx = perCust.agg(max("last_d").as("mx"))
    val obs = perCust
      .crossJoin(broadcast(mx))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g",
        "CAST(last_d - first_d AS BIGINT) AS dur",
        s"CASE WHEN last_d < mx - $CensorDays THEN 1 ELSE 0 END AS event")
    rmst(obs).withColumnRenamed("g", "c_mktsegment")
  }

  /** DuckDB twin: identical cells, spine windows, nano·day area. */
  val segmentRmstSql: String = {
    val tau = Horizon
    s"""WITH per_cust AS (
       |  SELECT o_custkey,
       |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
       |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |mx AS (SELECT max(last_d) AS mx FROM per_cust),
       |obs AS (
       |  SELECT c_mktsegment AS g, last_d - first_d AS dur,
       |    CASE WHEN last_d < mx - $CensorDays THEN 1 ELSE 0 END AS event
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
       |    CASE WHEN cnt_event < n_risk THEN CAST(floor(
       |      ln(CAST(n_risk - cnt_event AS DOUBLE) / CAST(n_risk AS DOUBLE))
       |      * 1e9 + 5e-1) AS BIGINT)
       |      ELSE CAST(-1000000000000000000 AS BIGINT) END AS term
       |  FROM risk WHERE cnt_event > 0 AND dur <= $tau),
       |sprev AS (
       |  SELECT g, dur, cnt_event, term,
       |    CAST(floor(exp(CAST(
       |      coalesce(sum(term) OVER (PARTITION BY g ORDER BY dur
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS DOUBLE) / 1e9) * 1e9 + 5e-1) AS BIGINT) AS s_prev,
       |    dur - coalesce(lag(dur) OVER (PARTITION BY g ORDER BY dur), 0)
       |      AS gap
       |  FROM steps),
       |areas AS (
       |  SELECT g, CAST(sum(cnt_event) AS BIGINT) AS d_horizon,
       |    CAST(sum(s_prev * gap) AS BIGINT) AS area_nano,
       |    CAST(sum(term) AS BIGINT) AS cum_total,
       |    CAST(max(dur) AS BIGINT) AS t_last
       |  FROM sprev GROUP BY 1)
       |SELECT tot.g AS c_mktsegment, n_total,
       |  coalesce(d_horizon, 0) AS d_horizon,
       |  round(CAST(coalesce(area_nano
       |    + CAST(floor(exp(CAST(cum_total AS DOUBLE) / 1e9) * 1e9 + 5e-1)
       |      AS BIGINT) * ($tau - t_last), ${tau}000000000)
       |    AS DOUBLE) / 1e9, 6) + 0.0 AS rmst_days
       |FROM tot LEFT JOIN areas ON tot.g = areas.g""".stripMargin
  }
}
