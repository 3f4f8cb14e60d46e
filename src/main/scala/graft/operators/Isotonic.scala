package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isotonic (PAVA) recalibration — the FIX rung of the calibration
  * deck: q156's ECE diagnoses miscalibration, q223's Hosmer–Lemeshow
  * adjudicates it, this one REPAIRS it, producing the monotone map
  * from forecast to recalibrated rate that is the standard
  * post-hoc calibrator (Zadrozny & Elkan 2002) when Platt's sigmoid
  * is too rigid. Fit on the identical q156/q167/q223 audit frame
  * (train-split forecast, eval-split outcomes), so the whole deck
  * reads one population.
  *
  * Computed WITHOUT the sequential pool-adjacent-violators loop via
  * the minimax identity (Ayer et al. 1955; Robertson–Wright–Dykstra
  * 1988, Thm 1.4.4): fit(t) = max_{i≤t} min_{j≥t} mean(x_i..x_j) —
  * which turns a data-ordered sequential algorithm into two windows
  * over the G² prefix-pair frame, G = forecast groups (dimension-
  * grade by construction; the registered query has one group per
  * order year). At a million calibration bins the pair frame is the
  * knob: pre-bin scores coarser (the q47 discipline).
  *
  * EXACTNESS: group means are floored micro integers
  * ((10⁶·X_ij) div N_ij), and floor COMMUTES with max/min (both are
  * elementwise selections of a monotone transform), so the reported
  * iso_micro is EXACTLY ⌊10⁶·(true rational PAVA fit)⌋ — spec-pinned
  * against a BigInt rational PAVA reference. No doubles anywhere
  * until the /10⁶ display columns.
  *
  * Plan/scale: cells (one calendar-grade aggregate upstream) →
  * row_number + prefix-sum windows over G rows → G² pair frame →
  * one window (min over j≥t per i) + one keyed max — all dimension-
  * grade; fact rows are touched only by the upstream frame. */
object Isotonic {

  /** Isotonic fit over ordered cells (g, o, n, x): groups keyed g,
    * isotonic in o (ties broken by g — deterministic both engines),
    * n trials, x successes. Returns (g, o, n, raw_micro, iso_micro):
    * raw = the group's own floored rate, iso = the PAVA fit,
    * nondecreasing in (o, g) order by construction. */
  def isotonicFit(cells: DataFrame): DataFrame = {
    val idx = cells.selectExpr("g", "o", "n", "x",
      "row_number() OVER (ORDER BY o, g) AS i",
      "CAST(sum(n) OVER (ORDER BY o, g) AS BIGINT) AS cn",
      "CAST(sum(x) OVER (ORDER BY o, g) AS BIGINT) AS cx")
      .localCheckpoint(true) // both pair-join sides read it
    // pair (i ≤ j): mean of groups i..j in floored micro units
    val pairs = idx.selectExpr("i", "cn", "cx", "n", "x")
      .as("a")
      .join(idx.selectExpr("i AS j", "cn AS cnj", "cx AS cxj").as("b"),
        col("a.i") <= col("b.j"))
      .selectExpr("i", "j",
        "(1000000 * (cxj - cx + x)) div (cnj - cn + n) AS mean_m")
    // mm(i, t) = min over j ≥ t of mean(i, j), materialized at row (i, t)
    val mm = pairs.selectExpr("i", "j",
      "min(mean_m) OVER (PARTITION BY i ORDER BY j DESC) AS mm")
    // fit(t) = max over i ≤ t of mm(i, t): every i ≤ t has a row at j = t
    val fit = mm.groupBy("j")
      .agg(expr("CAST(max(mm) AS BIGINT)").as("iso_micro"))
    idx.join(fit, idx("i") === fit("j"))
      .selectExpr("g", "o", "n",
        "(1000000 * x) div n AS raw_micro", "iso_micro")
  }

  /** q247: isotonic recalibration of the q156 per-year finish-rate
    * forecast against the held-out eval split — where raw eval rates
    * break monotonicity in the forecast, PAVA pools them; the
    * (forecast, iso) pairs ARE the recalibration lookup table. */
  def orderFinishIsotonic(spark: SparkSession, dir: String): DataFrame =
    isotonicFit(Calibration.evalFrame(spark, dir)
      .selectExpr("yr AS g", "p_micro AS o", "n_ev AS n", "x_ev AS x"))
      .selectExpr("g AS yr", "n AS n_eval",
        "round(CAST(o AS DOUBLE) / 1e6, 6) + 0.0 AS forecast",
        "round(CAST(raw_micro AS DOUBLE) / 1e6, 6) + 0.0 AS raw_rate",
        "round(CAST(iso_micro AS DOUBLE) / 1e6, 6) + 0.0 AS iso_rate")

  /** DuckDB twin: the identical integer minimax program on the q156
    * frame SQL. */
  val orderFinishIsotonicSql: String = {
    val h = graft.functions.Hashing.hash48Sql(
      Calibration.Seed, "(o_orderkey)::VARCHAR")
    s"""WITH rows_ AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv,
       |    $h % 10 AS b
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL),
       |model AS (
       |  SELECT yr, (1000000 * CAST(sum(conv) AS BIGINT)) // count(*) AS p_micro
       |  FROM rows_ WHERE b < 5 GROUP BY 1),
       |ev AS (
       |  SELECT r.yr AS g, m.p_micro AS o, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(conv) AS BIGINT) AS x
       |  FROM rows_ r JOIN model m ON m.yr = r.yr
       |  WHERE r.b >= 5 GROUP BY r.yr, m.p_micro),
       |idx AS (
       |  SELECT g, o, n, x,
       |    row_number() OVER (ORDER BY o, g) AS i,
       |    CAST(sum(n) OVER (ORDER BY o, g) AS BIGINT) AS cn,
       |    CAST(sum(x) OVER (ORDER BY o, g) AS BIGINT) AS cx
       |  FROM ev),
       |pairs AS (
       |  SELECT a.i AS i, b.i AS j,
       |    (1000000 * (b.cx - a.cx + a.x)) // (b.cn - a.cn + a.n) AS mean_m
       |  FROM idx a JOIN idx b ON a.i <= b.i),
       |mm AS (
       |  SELECT i, j,
       |    min(mean_m) OVER (PARTITION BY i ORDER BY j DESC) AS mm
       |  FROM pairs),
       |fit AS (
       |  SELECT j, CAST(max(mm) AS BIGINT) AS iso_micro FROM mm GROUP BY 1)
       |SELECT g AS yr, n AS n_eval,
       |  round(CAST(o AS DOUBLE) / 1e6, 6) + 0.0 AS forecast,
       |  round(CAST((1000000 * x) // n AS DOUBLE) / 1e6, 6) + 0.0 AS raw_rate,
       |  round(CAST(iso_micro AS DOUBLE) / 1e6, 6) + 0.0 AS iso_rate
       |FROM idx JOIN fit ON idx.i = fit.j""".stripMargin
  }
}
