package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Competing-risks cumulative incidence (Aalen–Johansen) — the third
  * survival rung after q110's Kaplan–Meier and q159's log-rank: when a
  * subject can exit by more than one CAUSE, "1 − KM of cause k alone"
  * OVERSTATES cause-k incidence (it treats competing exits as
  * censoring, redistributing their probability onto cause k). The
  * correct curve is CIF_k(t) = Σ_{tᵢ≤t} S(tᵢ⁻)·d_{k,i}/nᵢ with S the
  * ALL-CAUSE Kaplan–Meier — each cause's jumps weighted by the
  * probability of still being around to make them.
  *
  * Exactness (the q110 chain extended one multiply): the all-cause
  * ln-survival cumsum runs in integer NANO-NATS exactly as q110 (exact
  * BIGINT ratio args, 1e-9 ln snap, −1e18 total-death sentinel); the
  * pre-step survival is materialized on the integer nano grid —
  * s_prev = ⌊exp(cum_lnᵢ₋₁/1e9)·1e9 + ½⌋, exactly 1e9 at the first
  * step — so each CIF increment (s_prev·d_k) div n is an exact integer
  * and the CIF itself an integer cumsum: order-free, bit-equal in both
  * engines. Quantization: each increment floors ≤ 1 nano, so CIF drift
  * is ≤ #event-steps nanos — invisible at the round-6 display.
  * Magnitude: s_prev·d ≤ 1e9·N — Longs hold through N ≈ 1e9 subjects;
  * past that the products swap to DECIMAL(38,0) (the q82 stance).
  *
  * Plan/scale: observations → ONE duration-keyed cell aggregate
  * (map-side combined) carrying per-cause event counts; at-risk and
  * both cumulative windows run over the duration SPINE — bounded by
  * the observation span in days (the q110/q159 calendar-cell class),
  * never by subject count; the subject total is a broadcast 1-row
  * frame. */
object CompetingRisks {

  /** Censoring horizon (days before the dataset's last order), the
    * q110/q159 convention. */
  val CensorDays = 90
  /** Last-order price threshold splitting the two churn causes. */
  val BigFinal = 150000.0

  /** Aalen–Johansen CIFs from an observation frame with columns
    * (dur, event), event ∈ {0 = censored, 1, 2 = cause}. One row per
    * event time: at-risk, per-cause events, censored, all-cause
    * survival, cif_1, cif_2. */
  def cumulativeIncidence(obs: DataFrame): DataFrame = {
    // duration-spine-bounded and consumed twice (total + risk steps):
    // checkpoint so the observation subtree runs once (the q161 note)
    val cells = obs.groupBy("dur").agg(
      expr("CAST(count(1) AS BIGINT)").as("cnt_all"),
      expr("CAST(sum(CASE WHEN event = 1 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("d1"),
      expr("CAST(sum(CASE WHEN event = 2 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("d2"))
      .localCheckpoint(true)
    val totals = cells.agg(
      expr("CAST(sum(cnt_all) AS BIGINT)").as("n_total"))
    val wBelow = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .crossJoin(broadcast(totals))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("cnt_all").over(wBelow), lit(0L)))
      .filter(col("d1") + col("d2") > 0)
      // all-cause KM term, q110 verbatim (d = d1 + d2)
      .withColumn("term", expr(
        "CASE WHEN d1 + d2 < n_risk THEN CAST(floor(" +
          "ln(CAST(n_risk - d1 - d2 AS DOUBLE) / CAST(n_risk AS DOUBLE))" +
          " * 1e9 + 5e-1) AS BIGINT)" +
          " ELSE CAST(-1000000000000000000 AS BIGINT) END"))
      .withColumn("cum_ln", sum("term").over(wCum))
      // pre-step survival on the integer nano grid (exactly 1e9 at the
      // first event step: coalesce(0) → exp(0) → 1e9)
      .withColumn("s_prev", expr(
        "CAST(floor(exp(CAST(" +
          "coalesce(sum(term) OVER (ORDER BY dur" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)" +
          " AS DOUBLE) / 1e9) * 1e9 + 5e-1) AS BIGINT)"))
      .withColumn("inc1", expr("(s_prev * d1) div n_risk"))
      .withColumn("inc2", expr("(s_prev * d2) div n_risk"))
      .withColumn("cif1_nano", sum("inc1").over(wCum))
      .withColumn("cif2_nano", sum("inc2").over(wCum))
      .selectExpr("dur AS t_days", "n_risk", "d1", "d2",
        "cnt_all - d1 - d2 AS c_censored",
        "round(CAST(floor(exp(CAST(cum_ln AS DOUBLE) / 1e9) * 1e9 + 5e-1)" +
          " AS DOUBLE) / 1e9, 6) + 0.0 AS survival",
        "round(CAST(cif1_nano AS DOUBLE) / 1e9, 6) + 0.0 AS cif_1",
        "round(CAST(cif2_nano AS DOUBLE) / 1e9, 6) + 0.0 AS cif_2")
  }

  /** q163: HOW customers leave, not just whether — cause 1 = the final
    * order was small (< [[BigFinal]]: drifted away), cause 2 = the
    * final order was big (≥ [[BigFinal]]: completed a last large
    * purchase), censored within [[CensorDays]] of the dataset end.
    * The final order's size is read from a deterministic integer
    * encoding max(10·day + big_flag) — same-day ties resolve to the
    * big flag in both engines, no arg_max tie ambiguity. */
  def churnIncidence(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .selectExpr("o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        s"CASE WHEN o_totalprice >= $BigFinal THEN 1 ELSE 0 END AS big")
      .groupBy("o_custkey")
      .agg(min("d").as("first_d"),
        expr("max(CAST(d AS BIGINT) * 10 + big)").as("enc"))
      .localCheckpoint(true) // censor anchor + obs both read it
    val mx = perCust.agg(expr("max(enc div 10)").as("mx"))
    val obs = perCust
      .crossJoin(broadcast(mx))
      .selectExpr(
        "CAST(enc div 10 - first_d AS BIGINT) AS dur",
        s"CASE WHEN enc div 10 >= mx - $CensorDays THEN 0" +
          " WHEN enc % 10 = 0 THEN 1 ELSE 2 END AS event")
    cumulativeIncidence(obs)
  }

  /** DuckDB twin: identical encoding, cells, windows, nano program. */
  val churnIncidenceSql: String =
    s"""WITH per_cust AS (
       |  SELECT o_custkey,
       |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
       |    max(CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) * 10
       |      + (CASE WHEN o_totalprice >= $BigFinal THEN 1 ELSE 0 END)) AS enc
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |mx AS (SELECT max(enc // 10) AS mx FROM per_cust),
       |obs AS (
       |  SELECT CAST(enc // 10 - first_d AS BIGINT) AS dur,
       |    CASE WHEN enc // 10 >= mx - $CensorDays THEN 0
       |      WHEN enc % 10 = 0 THEN 1 ELSE 2 END AS event
       |  FROM per_cust CROSS JOIN mx),
       |cells AS (
       |  SELECT dur, CAST(count(*) AS BIGINT) AS cnt_all,
       |    CAST(sum(CASE WHEN event = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(sum(CASE WHEN event = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
       |  FROM obs GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt_all) AS BIGINT) AS n_total FROM cells),
       |risk AS (
       |  SELECT dur, cnt_all, d1, d2,
       |    CAST(n_total - coalesce(sum(cnt_all) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS n_risk
       |  FROM cells CROSS JOIN tot),
       |steps AS (
       |  SELECT dur, cnt_all, d1, d2, n_risk,
       |    CASE WHEN d1 + d2 < n_risk THEN CAST(floor(
       |      ln(CAST(n_risk - d1 - d2 AS DOUBLE) / CAST(n_risk AS DOUBLE))
       |      * 1e9 + 5e-1) AS BIGINT)
       |      ELSE CAST(-1000000000000000000 AS BIGINT) END AS term
       |  FROM risk WHERE d1 + d2 > 0),
       |cum AS (
       |  SELECT dur, cnt_all, d1, d2, n_risk,
       |    sum(term) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln,
       |    CAST(floor(exp(CAST(
       |      coalesce(sum(term) OVER (ORDER BY dur
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS DOUBLE) / 1e9) * 1e9 + 5e-1) AS BIGINT) AS s_prev
       |  FROM steps),
       |inc AS (
       |  SELECT dur, cnt_all, d1, d2, n_risk, cum_ln,
       |    sum((s_prev * d1) // n_risk) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif1_nano,
       |    sum((s_prev * d2) // n_risk) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif2_nano
       |  FROM cum)
       |SELECT dur AS t_days, n_risk, d1, d2,
       |  cnt_all - d1 - d2 AS c_censored,
       |  round(CAST(floor(exp(CAST(cum_ln AS DOUBLE) / 1e9) * 1e9 + 5e-1)
       |    AS DOUBLE) / 1e9, 6) + 0.0 AS survival,
       |  round(CAST(cif1_nano AS DOUBLE) / 1e9, 6) + 0.0 AS cif_1,
       |  round(CAST(cif2_nano AS DOUBLE) / 1e9, 6) + 0.0 AS cif_2
       |FROM inc""".stripMargin
}
