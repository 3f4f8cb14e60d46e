package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cochran–Mantel–Haenszel test + MH common odds ratio — the
  * CATEGORICAL twin of q184's stratified ATE: q184 adjusts a
  * continuous outcome for a discrete confounder; CMH does the same
  * for a 2×2 association (treatment × binary outcome), pooling the
  * per-stratum evidence instead of pooling the ROWS (the pooled q91
  * χ² on the collapsed table is exactly the Simpson's-paradox trap):
  *
  *   χ²_CMH = (Σ_c (a_c − E_c))² / Σ_c V_c,   df = 1
  *   E = n₁m₁/n,  V = n₁n₀m₁m₀ / (n²(n−1))   (hypergeometric moments)
  *   OR_MH = Σ(a·d/n) / Σ(b·c/n)
  *
  * Exactness: the q159 log-rank discipline — per-stratum margins are
  * exact BIGINTs; E, V, and the OR terms are shared-text doubles from
  * those integers snapped to a 1e-6 micro grid and summed as BIGINTs
  * (order-free across strata); a_sum is a plain integer sum; the χ²
  * and OR are ONE shared-text double each; χ²₁'s tail is
  * erfc(√(χ²/2)) — the A&S chain on z = √χ², no Wilson–Hilferty
  * needed at df 1. Degenerate strata (n < 2 or an empty margin)
  * contribute zero to every sum ALGEBRAICALLY and are counted.
  *
  * Plan/scale: one scan → one keyed stratum aggregate
  * (dimension-grade) → a 1-row finish. No windows, no joins back. */
object Cmh {

  /** CMH from a frame with (strat, t, y): stratum key, 0/1 treatment,
    * 0/1 outcome. Returns one row: (n_strata, n_strata_used, n_rows,
    * a_sum, chi2_cmh, or_mh, p_value). */
  def cmh(obs: DataFrame): DataFrame = {
    obs.groupBy("strat")
      .agg(
        expr("CAST(sum(t * y) AS BIGINT)").as("a"),
        expr("CAST(sum(t * (1 - y)) AS BIGINT)").as("b"),
        expr("CAST(sum((1 - t) * y) AS BIGINT)").as("c"),
        expr("CAST(sum((1 - t) * (1 - y)) AS BIGINT)").as("d"))
      .selectExpr("a", "b", "c", "d",
        "a + b AS n1", "c + d AS n0", "a + c AS m1", "b + d AS m0",
        "a + b + c + d AS n")
      .withColumn("used", expr(
        "CASE WHEN n >= 2 AND n1 > 0 AND n0 > 0 AND m1 > 0 AND m0 > 0" +
          " THEN 1 ELSE 0 END"))
      .selectExpr("n", "used",
        "CASE WHEN used = 1 THEN a ELSE 0 END AS a_used",
        s"CASE WHEN used = 1 THEN" +
          s" CAST(floor($ESql * 1e6 + 5e-1) AS BIGINT)" +
          s" ELSE 0 END AS e_micro",
        s"CASE WHEN used = 1 THEN" +
          s" CAST(floor($VSql * 1e6 + 5e-1) AS BIGINT)" +
          s" ELSE 0 END AS v_micro",
        s"CASE WHEN used = 1 THEN" +
          s" CAST(floor($AdSql * 1e6 + 5e-1) AS BIGINT)" +
          s" ELSE 0 END AS ad_micro",
        s"CASE WHEN used = 1 THEN" +
          s" CAST(floor($BcSql * 1e6 + 5e-1) AS BIGINT)" +
          s" ELSE 0 END AS bc_micro")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_strata"),
        expr("CAST(sum(used) AS BIGINT)").as("n_strata_used"),
        expr("CAST(sum(n) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(a_used) AS BIGINT)").as("a_sum"),
        expr("CAST(sum(e_micro) AS BIGINT)").as("e_sum"),
        expr("CAST(sum(v_micro) AS BIGINT)").as("v_sum"),
        expr("CAST(sum(ad_micro) AS BIGINT)").as("ad_sum"),
        expr("CAST(sum(bc_micro) AS BIGINT)").as("bc_sum"))
      .selectExpr("n_strata", "n_strata_used", "n_rows", "a_sum",
        s"round($Chi2Sql, 4) + 0.0 AS chi2_cmh",
        s"round($OrSql, 6) + 0.0 AS or_mh")
      .selectExpr("n_strata", "n_strata_used", "n_rows", "a_sum",
        "chi2_cmh", "or_mh",
        s"round(${pChi1Sql("chi2_cmh")}, 6) + 0.0 AS p_value")
  }

  // per-stratum shared-text moments (margins > 0 guaranteed by `used`)
  private val ESql =
    "(CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE) / CAST(n AS DOUBLE))"
  private val VSql =
    "(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) * CAST(m1 AS DOUBLE)" +
      " * CAST(m0 AS DOUBLE)" +
      " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)" +
      " * (CAST(n AS DOUBLE) - 1.0)))"
  private val AdSql =
    "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE))"
  private val BcSql =
    "(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"

  // finish-line shared text (exact integer inputs)
  private val Chi2Sql = {
    val diff = "(CAST(a_sum AS DOUBLE) - CAST(e_sum AS DOUBLE) / 1e6)"
    s"($diff * $diff / nullif(CAST(v_sum AS DOUBLE) / 1e6, 0.0))"
  }
  private val OrSql =
    "(CAST(ad_sum AS DOUBLE) / nullif(CAST(bc_sum AS DOUBLE), 0.0))"

  /** χ²₁ upper tail = erfc(√(χ²/2)) via the A&S 7.1.26 chain. */
  private def pChi1Sql(chi2: String): String = {
    val x = s"(sqrt($chi2) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"((((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x))))"
  }

  /** q192: controlling for market segment, are urgent-priority orders
    * more likely to have FINISHED status? (The pooled table is the
    * Simpson trap; CMH pools the evidence instead.) */
  def urgencyFinishCmh(spark: SparkSession, dir: String): DataFrame =
    cmh(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderstatus").isNotNull
        && col("o_orderpriority").isNotNull)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS strat",
        "CASE WHEN substring(o_orderpriority, 1, 1) IN ('1', '2')" +
          " THEN 1 ELSE 0 END AS t",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y"))

  /** DuckDB twin: identical margins, snapped moments, and finish. */
  val urgencyFinishCmhSql: String =
    s"""WITH obs AS (
       |  SELECT c_mktsegment AS strat,
       |    CASE WHEN substring(o_orderpriority, 1, 1) IN ('1', '2')
       |      THEN 1 ELSE 0 END AS t,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
       |    AND o_orderpriority IS NOT NULL),
       |cells AS (
       |  SELECT strat,
       |    CAST(sum(t * y) AS BIGINT) AS a,
       |    CAST(sum(t * (1 - y)) AS BIGINT) AS b,
       |    CAST(sum((1 - t) * y) AS BIGINT) AS c,
       |    CAST(sum((1 - t) * (1 - y)) AS BIGINT) AS d
       |  FROM obs GROUP BY 1),
       |margins AS (
       |  SELECT a, b, c, d, a + b AS n1, c + d AS n0, a + c AS m1,
       |    b + d AS m0, a + b + c + d AS n
       |  FROM cells),
       |flagged AS (
       |  SELECT *, CASE WHEN n >= 2 AND n1 > 0 AND n0 > 0 AND m1 > 0
       |    AND m0 > 0 THEN 1 ELSE 0 END AS used
       |  FROM margins),
       |terms AS (
       |  SELECT n, used,
       |    CASE WHEN used = 1 THEN a ELSE 0 END AS a_used,
       |    CASE WHEN used = 1 THEN
       |      CAST(floor($ESql * 1e6 + 5e-1) AS BIGINT) ELSE 0 END AS e_micro,
       |    CASE WHEN used = 1 THEN
       |      CAST(floor($VSql * 1e6 + 5e-1) AS BIGINT) ELSE 0 END AS v_micro,
       |    CASE WHEN used = 1 THEN
       |      CAST(floor($AdSql * 1e6 + 5e-1) AS BIGINT) ELSE 0 END AS ad_micro,
       |    CASE WHEN used = 1 THEN
       |      CAST(floor($BcSql * 1e6 + 5e-1) AS BIGINT) ELSE 0 END AS bc_micro
       |  FROM flagged),
       |summed AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
       |    CAST(sum(used) AS BIGINT) AS n_strata_used,
       |    CAST(sum(n) AS BIGINT) AS n_rows,
       |    CAST(sum(a_used) AS BIGINT) AS a_sum,
       |    CAST(sum(e_micro) AS BIGINT) AS e_sum,
       |    CAST(sum(v_micro) AS BIGINT) AS v_sum,
       |    CAST(sum(ad_micro) AS BIGINT) AS ad_sum,
       |    CAST(sum(bc_micro) AS BIGINT) AS bc_sum
       |  FROM terms),
       |finish AS (
       |  SELECT n_strata, n_strata_used, n_rows, a_sum,
       |    round($Chi2Sql, 4) + 0.0 AS chi2_cmh,
       |    round($OrSql, 6) + 0.0 AS or_mh
       |  FROM summed)
       |SELECT n_strata, n_strata_used, n_rows, a_sum, chi2_cmh, or_mh,
       |  round(${pChi1Sql("chi2_cmh")}, 6) + 0.0 AS p_value
       |FROM finish""".stripMargin
}
