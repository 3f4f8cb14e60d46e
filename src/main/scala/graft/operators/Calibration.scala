package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Reliability diagram + Expected Calibration Error — the ML-ops
  * staple behind every "is this model's confidence honest" dashboard
  * (Guo et al. 2017): bin predictions by confidence, compare each
  * bin's mean confidence against its empirical rate, and summarize
  * with ECE = Σ (n_i/N)·|acc_i − conf_i|. Composes with q61/q94 (the
  * score producers), q149 (conformal wraps a point model, calibration
  * audits a probabilistic one) and q86 (drift in the inputs shows up
  * here as emerging miscalibration).
  *
  * The model under audit is the same honest-baseline shape as q149:
  * per-year empirical finish rates fitted on a hash-threshold TRAIN
  * split, evaluated on the disjoint EVAL split — a correctly-specified
  * baseline, so the diagram should read near-diagonal and ECE small
  * (the spec plants miscalibration to see both move).
  *
  * Exactness — everything in MICRO fixed point so no double ever sums
  * across rows: p_micro = (10⁶·x) div n per year (exact BIGINT); bins
  * = p_micro div 10⁵ (clamped to 9); per-bin conf = Σ(n_y·p_micro,y)
  * div n_bin and acc = (10⁶·conv) div n_bin (integer floor division,
  * order-free); gap and ECE are pure integer arithmetic; the /10⁶
  * happens once per reported column. Both engines run the identical
  * integer program.
  *
  * Plan/scale: one scan → per-(year, split) aggregates (map-side
  * combined, calendar-bounded) → broadcast model join back → one
  * per-bin aggregate (≤ 10 rows) → a 1-row ECE broadcast onto the
  * bins. Nothing corpus-sized concentrates.
  */
object Calibration {

  /** Split seed (hash48 family member). */
  val Seed = 156

  /** The audit frame shared by q156 and q167: per-year eval-split
    * counts with the train-split forecast — (yr, n_ev, x_ev,
    * p_micro). */
  private[operators] def evalFrame(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderstatus").isNotNull)
      .select(expr("year(CAST(o_orderdate AS DATE))").as("yr"),
        expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END").as("conv"),
        (Hashing.hash48(Seed, col("o_orderkey").cast("string")) % 10).as("b"))
      .localCheckpoint(true) // train + eval both read it
    val model = rows.filter(col("b") < 5)
      .groupBy("yr")
      .agg(count(lit(1)).as("n_tr"), sum(col("conv")).as("x_tr"))
      .selectExpr("yr", "(1000000 * x_tr) div n_tr AS p_micro")
    rows.filter(col("b") >= 5)
      .groupBy("yr")
      .agg(count(lit(1)).as("n_ev"), sum(col("conv")).as("x_ev"))
      .join(broadcast(model), "yr")
  }

  /** q156: reliability diagram + ECE for the per-year finish-rate
    * baseline on orders. */
  def orderFinishCalibration(spark: SparkSession, dir: String): DataFrame = {
    val evalYears = evalFrame(spark, dir)
      .selectExpr("yr", "n_ev", "x_ev", "p_micro",
        "least(p_micro div 100000, 9) AS bin")
    val bins = evalYears.groupBy("bin")
      .agg(sum(col("n_ev")).as("n_eval"),
        sum(col("x_ev")).as("x_eval"),
        sum(expr("n_ev * p_micro")).as("wconf"))
      .selectExpr("bin", "n_eval",
        "wconf div n_eval AS conf_micro",
        "(1000000 * x_eval) div n_eval AS acc_micro")
      .selectExpr("bin", "n_eval", "conf_micro", "acc_micro",
        "abs(acc_micro - conf_micro) AS gap_micro")
    val ece = bins.agg(
      expr("sum(n_eval * gap_micro) div sum(n_eval)").as("ece_micro"))
    bins.crossJoin(broadcast(ece))
      .selectExpr("bin", "n_eval",
        "round(CAST(conf_micro AS DOUBLE) / 1e6, 6) + 0.0 AS conf",
        "round(CAST(acc_micro AS DOUBLE) / 1e6, 6) + 0.0 AS acc",
        "round(CAST(gap_micro AS DOUBLE) / 1e6, 6) + 0.0 AS gap",
        "round(CAST(ece_micro AS DOUBLE) / 1e6, 6) + 0.0 AS ece")
      .orderBy("bin")
  }

  /** DuckDB twin: the identical integer program. */
  val orderFinishCalibrationSql: String = {
    val h = Hashing.hash48Sql(Seed, "(o_orderkey)::VARCHAR")
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
       |    CAST(sum(conv) AS BIGINT) AS x_ev, m.p_micro,
       |    least(m.p_micro // 100000, 9) AS bin
       |  FROM rows_ r JOIN model m ON m.yr = r.yr
       |  WHERE r.b >= 5 GROUP BY r.yr, m.p_micro),
       |bins AS (
       |  SELECT bin, CAST(sum(n_ev) AS BIGINT) AS n_eval,
       |    CAST(sum(n_ev * p_micro) AS BIGINT) // CAST(sum(n_ev) AS BIGINT)
       |      AS conf_micro,
       |    (1000000 * CAST(sum(x_ev) AS BIGINT)) // CAST(sum(n_ev) AS BIGINT)
       |      AS acc_micro
       |  FROM ev GROUP BY 1),
       |b2 AS (
       |  SELECT bin, n_eval, conf_micro, acc_micro,
       |    abs(acc_micro - conf_micro) AS gap_micro
       |  FROM bins),
       |e AS (
       |  SELECT CAST(sum(n_eval * gap_micro) AS BIGINT)
       |    // CAST(sum(n_eval) AS BIGINT) AS ece_micro
       |  FROM b2)
       |SELECT bin, n_eval,
       |  round(CAST(conf_micro AS DOUBLE) / 1e6, 6) + 0.0 AS conf,
       |  round(CAST(acc_micro AS DOUBLE) / 1e6, 6) + 0.0 AS acc,
       |  round(CAST(gap_micro AS DOUBLE) / 1e6, 6) + 0.0 AS gap,
       |  round(CAST(ece_micro AS DOUBLE) / 1e6, 6) + 0.0 AS ece
       |FROM b2 CROSS JOIN e
       |ORDER BY bin""".stripMargin
  }
}
