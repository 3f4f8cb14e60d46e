package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stratified average treatment effect — the adjustment rung of the
  * causal deck: q119's DiD needs a time axis, q152's CUPED needs a
  * pre-period covariate; stratification needs only a discrete
  * confounder. Within each stratum the treated/control comparison is
  * apples-to-apples; the ATE re-weights the per-stratum differences by
  * stratum size (and with stratum-exact propensities, IPW/Horvitz–
  * Thompson collapses to the SAME estimator — so the naive pooled
  * difference is shipped alongside to show what the adjustment
  * removed). SE from the classical stratified variance
  * Σ (n_c/N)²·(v₁/n₁ + v₀/n₀).
  *
  * Exactness: per-stratum sufficient statistics (n, Σy, Σy² in cents)
  * are exact BIGINT/DECIMAL(38,0); each stratum's ATE term is ONE
  * shared-text double snapped to a milli-cent·row grid and summed as
  * integers (order-free — strata sums must not depend on partition
  * order); variance terms snap to the cents² grid the same way.
  * Eligibility (n₁ ≥ 2 AND n₀ ≥ 2, so the SE exists) is decided per
  * stratum in exact integers; dropped strata/rows are COUNTED in the
  * output, not silently vanished.
  *
  * Plan/scale: one scan → one keyed cell aggregate (stratum ×
  * conditional sums — dimension-grade by construction) → broadcast
  * totals → a 1-row finish. No windows, no fact-side joins beyond the
  * broadcast dimension. */
object StratAte {

  /** ATE from a frame with (strat, t, y): stratum key, 0/1 treatment,
    * exact BIGINT outcome. `unit` scales outcome units at display.
    * Returns one row: (n_strata, n_strata_used, n_rows, n_rows_used,
    * naive_diff, ate, se, z). */
  def stratifiedAte(obs: DataFrame, unit: Double): DataFrame = {
    val cells = obs.groupBy("strat")
      .agg(
        expr("CAST(sum(t) AS BIGINT)").as("n1"),
        expr("CAST(count(1) - sum(t) AS BIGINT)").as("n0"),
        expr("CAST(sum(y * t) AS DECIMAL(38,0))").as("s1"),
        expr("CAST(sum(y * (1 - t)) AS DECIMAL(38,0))").as("s0"),
        expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y * t) AS DECIMAL(38,0))")
          .as("q1"),
        expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y * (1 - t))" +
          " AS DECIMAL(38,0))").as("q0"))
      .withColumn("used", expr("CASE WHEN n1 >= 2 AND n0 >= 2" +
        " THEN 1 ELSE 0 END"))
      .localCheckpoint(true) // feeds totals AND the per-stratum terms
    val totals = cells.agg(
      expr("CAST(count(1) AS BIGINT)").as("n_strata"),
      expr("CAST(sum(used) AS BIGINT)").as("n_strata_used"),
      expr("CAST(sum(n1 + n0) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(used * (n1 + n0)) AS BIGINT)").as("n_rows_used"),
      expr("CAST(sum(used * n1) AS BIGINT)").as("n1_used"),
      expr("CAST(sum(used * n0) AS BIGINT)").as("n0_used"),
      expr("CAST(sum(CASE WHEN used = 1 THEN s1 ELSE 0 END)" +
        " AS DECIMAL(38,0))").as("s1_used"),
      expr("CAST(sum(CASE WHEN used = 1 THEN s0 ELSE 0 END)" +
        " AS DECIMAL(38,0))").as("s0_used"))
    cells.filter(col("used") === 1)
      .crossJoin(broadcast(totals))
      .selectExpr("n_strata", "n_strata_used", "n_rows", "n_rows_used",
        "n1_used", "n0_used", "s1_used", "s0_used",
        s"CAST(floor($DiffSql * CAST(n1 + n0 AS DOUBLE) * 1e3 + 5e-1)" +
          " AS BIGINT) AS ate_term",
        s"CAST(floor($VarSql + 5e-1) AS BIGINT) AS var_term")
      .groupBy("n_strata", "n_strata_used", "n_rows", "n_rows_used",
        "n1_used", "n0_used", "s1_used", "s0_used")
      .agg(
        expr("CAST(sum(ate_term) AS BIGINT)").as("ate_sum"),
        expr("CAST(sum(var_term) AS BIGINT)").as("var_sum"))
      .selectExpr("n_strata", "n_strata_used", "n_rows", "n_rows_used",
        s"round($NaiveSql * ${unitSql(unit)}, 6) + 0.0 AS naive_diff",
        s"round($AteSql * ${unitSql(unit)}, 6) + 0.0 AS ate",
        s"round($SeSql * ${unitSql(unit)}, 6) + 0.0 AS se")
      .selectExpr("n_strata", "n_strata_used", "n_rows", "n_rows_used",
        "naive_diff", "ate", "se",
        "round(ate / nullif(se, 0.0), 4) + 0.0 AS z")
  }

  // per-stratum shared-text terms (n1, n0 ≥ 2 guaranteed by `used`)
  private val DiffSql =
    "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
      " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
  private val VarSql = {
    val v1 = "((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)" +
      " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))" +
      " / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))"
    val v0 = "((CAST(n0 AS DOUBLE) * CAST(q0 AS DOUBLE)" +
      " - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))" +
      " / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)))"
    val w = "(CAST(n1 + n0 AS DOUBLE) / CAST(n_rows_used AS DOUBLE))"
    s"($w * $w * ($v1 / CAST(n1 AS DOUBLE) + $v0 / CAST(n0 AS DOUBLE)))"
  }

  // finish-line shared text (exact integer inputs)
  private val NaiveSql =
    "(CAST(s1_used AS DOUBLE) / CAST(n1_used AS DOUBLE)" +
      " - CAST(s0_used AS DOUBLE) / CAST(n0_used AS DOUBLE))"
  private val AteSql =
    "(CAST(ate_sum AS DOUBLE) / 1e3 / CAST(n_rows_used AS DOUBLE))"
  private val SeSql = "(sqrt(CAST(var_sum AS DOUBLE)))"
  private def unitSql(unit: Double) = s"CAST($unit AS DOUBLE)"
  private val UnitSql = unitSql(0.01) // registered query: cents → dollars

  /** q184: how much more do urgent-priority orders spend, once the
    * (segment × nation) customer mix is held fixed? Treatment =
    * priority ∈ {1-URGENT, 2-HIGH}, outcome = order cents, strata =
    * c_mktsegment × c_nationkey. */
  def urgencySpendAte(spark: SparkSession, dir: String): DataFrame =
    stratifiedAte(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull
        && col("o_orderpriority").isNotNull)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr(
        "c_mktsegment || '|' || CAST(c_nationkey AS STRING) AS strat",
        "CASE WHEN substring(o_orderpriority, 1, 1) IN ('1', '2')" +
          " THEN 1 ELSE 0 END AS t",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS y"), 0.01)

  /** DuckDB twin: identical cells, eligibility, snapped terms. */
  val urgencySpendAteSql: String =
    s"""WITH obs AS (
       |  SELECT c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR) AS strat,
       |    CASE WHEN substring(o_orderpriority, 1, 1) IN ('1', '2')
       |      THEN 1 ELSE 0 END AS t,
       |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS y
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
       |    AND o_orderpriority IS NOT NULL),
       |cells AS (
       |  SELECT strat,
       |    CAST(sum(t) AS BIGINT) AS n1,
       |    CAST(count(*) - sum(t) AS BIGINT) AS n0,
       |    CAST(sum(y * t) AS HUGEINT) AS s1,
       |    CAST(sum(y * (1 - t)) AS HUGEINT) AS s0,
       |    CAST(sum(CAST(y AS HUGEINT) * y * t) AS HUGEINT) AS q1,
       |    CAST(sum(CAST(y AS HUGEINT) * y * (1 - t)) AS HUGEINT) AS q0,
       |    CASE WHEN sum(t) >= 2 AND count(*) - sum(t) >= 2
       |      THEN 1 ELSE 0 END AS used
       |  FROM obs GROUP BY 1),
       |totals AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
       |    CAST(sum(used) AS BIGINT) AS n_strata_used,
       |    CAST(sum(n1 + n0) AS BIGINT) AS n_rows,
       |    CAST(sum(used * (n1 + n0)) AS BIGINT) AS n_rows_used,
       |    CAST(sum(used * n1) AS BIGINT) AS n1_used,
       |    CAST(sum(used * n0) AS BIGINT) AS n0_used,
       |    CAST(sum(CASE WHEN used = 1 THEN s1 ELSE 0 END) AS HUGEINT) AS s1_used,
       |    CAST(sum(CASE WHEN used = 1 THEN s0 ELSE 0 END) AS HUGEINT) AS s0_used
       |  FROM cells),
       |terms AS (
       |  SELECT n_strata, n_strata_used, n_rows, n_rows_used,
       |    n1_used, n0_used, s1_used, s0_used,
       |    CAST(floor($DiffSql * CAST(n1 + n0 AS DOUBLE) * 1e3 + 5e-1)
       |      AS BIGINT) AS ate_term,
       |    CAST(floor($VarSql + 5e-1) AS BIGINT) AS var_term
       |  FROM cells CROSS JOIN totals WHERE used = 1),
       |summed AS (
       |  SELECT n_strata, n_strata_used, n_rows, n_rows_used,
       |    n1_used, n0_used, s1_used, s0_used,
       |    CAST(sum(ate_term) AS BIGINT) AS ate_sum,
       |    CAST(sum(var_term) AS BIGINT) AS var_sum
       |  FROM terms
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |finish AS (
       |  SELECT n_strata, n_strata_used, n_rows, n_rows_used,
       |    round($NaiveSql * $UnitSql, 6) + 0.0 AS naive_diff,
       |    round($AteSql * $UnitSql, 6) + 0.0 AS ate,
       |    round($SeSql * $UnitSql, 6) + 0.0 AS se
       |  FROM summed)
       |SELECT n_strata, n_strata_used, n_rows, n_rows_used,
       |  naive_diff, ate, se,
       |  round(ate / nullif(se, 0.0), 4) + 0.0 AS z
       |FROM finish""".stripMargin
}
