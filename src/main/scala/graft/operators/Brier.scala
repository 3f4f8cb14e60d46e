package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Brier score with the Murphy (1973) decomposition — WHY a
  * probabilistic model scores what it scores: B = REL − RES + UNC over
  * forecast-value cells, where reliability (REL) is the calibration
  * penalty q156's ECE eyeballs (squared, n-weighted), resolution (RES)
  * rewards forecasts that actually separate outcomes, and uncertainty
  * (UNC = ō(1−ō)) is the data's irreducible floor. Two models with the
  * SAME ECE can differ entirely in resolution — this is the companion
  * readout that says whether the model is informative, not merely
  * honest. Audits the q156 frame (same split, same per-year forecast),
  * so the two reports compose.
  *
  * Exactness: cells key by the FORECAST VALUE (p_micro — exact BIGINT
  * micro-probabilities). Per cell, every term is integer-cleared:
  *   brier_num = n·p² − 2·10⁶·p·x + 10¹²·x            (EXACT, no floor)
  *   rel_num   = (p·n − 10⁶·x)² div n                  (floor ≤ 1)
  *   res_num   = (x·N − X·n)² div n                    (floor ≤ 1)
  * carried as DECIMAL(38,0) in Spark / HUGEINT in DuckDB (the q152
  * stance — the squares overflow BIGINT past ~10⁶-row cells).
  * Magnitude note: Spark's `div` lowers its quotient to LONG, so the
  * res quotient N²·n bounds the Long-safe range to N ≈ 10⁷ eval rows —
  * far past the registered scales; beyond that the two divs swap to a
  * decimal divide + floor (the q82 stance). Sums are order-free, and
  * each reported number
  * is ONE shared-text double: B = Σbrier/(10¹²N), REL = Σrel/(10¹²N),
  * RES = Σres/N³, UNC = X(N−X)/N². The Murphy identity
  * B = REL − RES + UNC then holds to the per-cell floors (≤ #cells
  * parts in 10¹²) — spec-asserted.
  *
  * Plan/scale: the q156 frame (calendar-bounded aggregates, broadcast
  * model join) → one forecast-cell aggregate (≤ #years rows) → a
  * broadcast 1-row total → one 1-row report. */
object Brier {

  /** q167: Brier decomposition of the q156 per-year finish-rate
    * baseline on its eval split. */
  def orderFinishBrier(spark: SparkSession, dir: String): DataFrame =
    decompose(Calibration.evalFrame(spark, dir))

  /** Murphy decomposition over any frame with (p_micro, n_ev, x_ev):
    * forecast in exact micro-probabilities, trial and success counts. */
  def decompose(evalRows: DataFrame): DataFrame = {
    val cells = evalRows
      .groupBy("p_micro")
      .agg(expr("CAST(sum(n_ev) AS BIGINT)").as("n_c"),
        expr("CAST(sum(x_ev) AS BIGINT)").as("x_c"))
      .localCheckpoint(true) // totals + terms both read it
    val totals = cells.agg(
      expr("CAST(sum(n_c) AS BIGINT)").as("n_total"),
      expr("CAST(sum(x_c) AS BIGINT)").as("x_total"))
    cells.crossJoin(broadcast(totals))
      .selectExpr("n_total", "x_total",
        "CAST(n_c AS DECIMAL(38,0)) * p_micro * p_micro" +
          " - 2000000 * CAST(p_micro AS DECIMAL(38,0)) * x_c" +
          " + 1000000000000 * CAST(x_c AS DECIMAL(38,0)) AS brier_num",
        "(CAST(p_micro AS DECIMAL(38,0)) * n_c - 1000000 * CAST(x_c AS DECIMAL(38,0)))" +
          " * (CAST(p_micro AS DECIMAL(38,0)) * n_c - 1000000 * CAST(x_c AS DECIMAL(38,0)))" +
          " div n_c AS rel_num",
        "(CAST(x_c AS DECIMAL(38,0)) * n_total - CAST(x_total AS DECIMAL(38,0)) * n_c)" +
          " * (CAST(x_c AS DECIMAL(38,0)) * n_total - CAST(x_total AS DECIMAL(38,0)) * n_c)" +
          " div n_c AS res_num")
      .groupBy("n_total", "x_total")
      .agg(
        sum(expr("CAST(brier_num AS DECIMAL(38,0))")).as("sb"),
        sum(expr("CAST(rel_num AS DECIMAL(38,0))")).as("srel"),
        sum(expr("CAST(res_num AS DECIMAL(38,0))")).as("sres"))
      .selectExpr("n_total",
        "round(CAST(sb AS DOUBLE) / 1e12 / CAST(n_total AS DOUBLE), 6)" +
          " + 0.0 AS brier",
        "round(CAST(srel AS DOUBLE) / 1e12 / CAST(n_total AS DOUBLE), 6)" +
          " + 0.0 AS reliability",
        "round(CAST(sres AS DOUBLE) / CAST(n_total AS DOUBLE)" +
          " / CAST(n_total AS DOUBLE) / CAST(n_total AS DOUBLE), 6)" +
          " + 0.0 AS resolution",
        "round(CAST(x_total AS DOUBLE) * CAST(n_total - x_total AS DOUBLE)" +
          " / CAST(n_total AS DOUBLE) / CAST(n_total AS DOUBLE), 6)" +
          " + 0.0 AS uncertainty")
  }

  /** DuckDB twin: identical integer program, HUGEINT where Spark
    * carries DECIMAL(38,0) (DuckDB's decimal multiply width-errors
    * past 38 — the q152 stance). */
  val orderFinishBrierSql: String = {
    val h = Hashing.hash48Sql(Calibration.Seed, "(o_orderkey)::VARCHAR")
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
       |  SELECT r.yr, CAST(count(*) AS BIGINT) AS n_ev,
       |    CAST(sum(conv) AS BIGINT) AS x_ev, m.p_micro
       |  FROM rows_ r JOIN model m ON m.yr = r.yr
       |  WHERE r.b >= 5 GROUP BY r.yr, m.p_micro),
       |cells AS (
       |  SELECT p_micro, CAST(sum(n_ev) AS BIGINT) AS n_c,
       |    CAST(sum(x_ev) AS BIGINT) AS x_c
       |  FROM ev GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n_total,
       |               CAST(sum(x_c) AS BIGINT) AS x_total FROM cells),
       |terms AS (
       |  SELECT n_total, x_total,
       |    CAST(n_c AS HUGEINT) * p_micro * p_micro
       |      - 2000000 * CAST(p_micro AS HUGEINT) * x_c
       |      + 1000000000000 * CAST(x_c AS HUGEINT) AS brier_num,
       |    (CAST(p_micro AS HUGEINT) * n_c - 1000000 * CAST(x_c AS HUGEINT))
       |      * (CAST(p_micro AS HUGEINT) * n_c - 1000000 * CAST(x_c AS HUGEINT))
       |      // n_c AS rel_num,
       |    (CAST(x_c AS HUGEINT) * n_total - CAST(x_total AS HUGEINT) * n_c)
       |      * (CAST(x_c AS HUGEINT) * n_total - CAST(x_total AS HUGEINT) * n_c)
       |      // n_c AS res_num
       |  FROM cells CROSS JOIN tot),
       |agg AS (
       |  SELECT n_total, x_total,
       |    CAST(sum(brier_num) AS HUGEINT) AS sb,
       |    CAST(sum(rel_num) AS HUGEINT) AS srel,
       |    CAST(sum(res_num) AS HUGEINT) AS sres
       |  FROM terms GROUP BY 1, 2)
       |SELECT n_total,
       |  round(CAST(sb AS DOUBLE) / 1e12 / CAST(n_total AS DOUBLE), 6)
       |    + 0.0 AS brier,
       |  round(CAST(srel AS DOUBLE) / 1e12 / CAST(n_total AS DOUBLE), 6)
       |    + 0.0 AS reliability,
       |  round(CAST(sres AS DOUBLE) / CAST(n_total AS DOUBLE)
       |    / CAST(n_total AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
       |    + 0.0 AS resolution,
       |  round(CAST(x_total AS DOUBLE) * CAST(n_total - x_total AS DOUBLE)
       |    / CAST(n_total AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
       |    + 0.0 AS uncertainty
       |FROM agg""".stripMargin
  }
}
