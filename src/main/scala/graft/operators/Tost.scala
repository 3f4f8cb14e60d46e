package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TOST equivalence test — the question q96 CANNOT answer: a
  * non-significant Welch t never shows two pipelines are the SAME
  * (absence of evidence); TOST inverts the burden — two one-sided
  * tests against a pre-declared margin ±δ, and only when BOTH reject
  * is the difference proven to sit inside the margin. The A/B
  * deliverable for "did the refactor change revenue?" and the
  * data-pipeline gate for "is the new corpus mix equivalent?".
  *
  *   t_lower = (Δ + δ)/se,  t_upper = (δ − Δ)/se,
  *   p_equiv = max of the two one-sided p's = tail at min(t_l, t_u)
  *
  * Exactness: per-class sufficient statistics (n, Σv, Σv² in cents)
  * are exact BIGINT/DECIMAL(38,0) (the q96 discipline); Δ, the Welch
  * se, both t's, and p are ONE shared-text double chain; the tail uses
  * the A&S erfc normal approximation — exact as df → ∞ and the
  * registered frame's df is in the thousands (df ships via n_a/n_b so
  * a small-sample caller can see the approximation). δ is part of the
  * OUTPUT (an equivalence claim without its margin is meaningless).
  *
  * Plan/scale: ONE map-side-combined aggregate per group → a
  * dimension-grade finish. No windows, no second pass. */
object Tost {

  /** TOST from a frame with (g, cls, v): group, two-level class, exact
    * BIGINT value; margin `deltaCents` on the same grid. Returns one
    * row per group: (g, n_a, n_b, delta_margin, diff, se, t_lower,
    * t_upper, p_equiv, equivalent). */
  def tost(obs: DataFrame, clsA: String, clsB: String,
      deltaCents: Long): DataFrame = {
    obs.groupBy("g")
      .agg(
        expr(s"CAST(sum(CASE WHEN cls = '$clsA' THEN 1 ELSE 0 END)" +
          " AS BIGINT)").as("n_a"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsB' THEN 1 ELSE 0 END)" +
          " AS BIGINT)").as("n_b"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsA' THEN v ELSE 0 END)" +
          " AS DECIMAL(38,0))").as("s_a"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsB' THEN v ELSE 0 END)" +
          " AS DECIMAL(38,0))").as("s_b"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsA' THEN" +
          " CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS DECIMAL(38,0))")
          .as("q_a"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsB' THEN" +
          " CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS DECIMAL(38,0))")
          .as("q_b"))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .selectExpr("g", "n_a", "n_b",
        s"CAST($deltaCents AS BIGINT) AS delta_margin",
        s"round($DiffSql, 4) + 0.0 AS diff",
        s"round($SeSql, 4) + 0.0 AS se",
        s"round(($DiffSql + CAST($deltaCents AS DOUBLE))" +
          s" / nullif($SeSql, 0.0), 4) + 0.0 AS t_lower",
        s"round((CAST($deltaCents AS DOUBLE) - $DiffSql)" +
          s" / nullif($SeSql, 0.0), 4) + 0.0 AS t_upper")
      .selectExpr("g", "n_a", "n_b", "delta_margin", "diff", "se",
        "t_lower", "t_upper",
        s"round(${pUpperSql("least(t_lower, t_upper)")}, 6) + 0.0" +
          " AS p_equiv")
      .selectExpr("g", "n_a", "n_b", "delta_margin", "diff", "se",
        "t_lower", "t_upper", "p_equiv",
        "CAST(CASE WHEN p_equiv < 0.05 THEN 1 ELSE 0 END AS BIGINT)" +
          " AS equivalent")
  }

  private val DiffSql =
    "(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)" +
      " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
  private val SeSql = {
    def v(s: String) =
      s"((CAST(q_$s AS DOUBLE) - CAST(s_$s AS DOUBLE)" +
        s" * CAST(s_$s AS DOUBLE) / CAST(n_$s AS DOUBLE))" +
        s" / (CAST(n_$s AS DOUBLE) - 1.0) / CAST(n_$s AS DOUBLE))"
    s"(sqrt(${v("a")} + ${v("b")}))"
  }

  /** One-sided upper-tail normal p via the A&S 7.1.26 erfc chain. */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** Margin for the registered query: ±$500 mean order value. */
  val MarginCents = 50000L

  /** q195: is mean order value EQUIVALENT (within ±$500) between
    * finished and open orders, per priority? The q96 frame with the
    * burden of proof inverted. */
  def orderEquivalence(spark: SparkSession, dir: String): DataFrame =
    tost(Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("F", "O")
        && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g", "o_orderstatus AS cls",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS v"),
      "F", "O", MarginCents)
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical sums and chain. */
  val orderEquivalenceSql: String =
    s"""WITH agg AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN
       |      CAST(floor(o_totalprice * 1e2) AS BIGINT) ELSE 0 END)
       |      AS HUGEINT) AS s_a,
       |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN
       |      CAST(floor(o_totalprice * 1e2) AS BIGINT) ELSE 0 END)
       |      AS HUGEINT) AS s_b,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN
       |      CAST(CAST(floor(o_totalprice * 1e2) AS BIGINT) AS HUGEINT)
       |      * CAST(floor(o_totalprice * 1e2) AS BIGINT) ELSE 0 END)
       |      AS HUGEINT) AS q_a,
       |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN
       |      CAST(CAST(floor(o_totalprice * 1e2) AS BIGINT) AS HUGEINT)
       |      * CAST(floor(o_totalprice * 1e2) AS BIGINT) ELSE 0 END)
       |      AS HUGEINT) AS q_b
       |  FROM orders
       |  WHERE o_orderstatus IN ('F', 'O') AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |kept AS (SELECT * FROM agg WHERE n_a >= 2 AND n_b >= 2),
       |tees AS (
       |  SELECT g, n_a, n_b, CAST($MarginCents AS BIGINT) AS delta_margin,
       |    round($DiffSql, 4) + 0.0 AS diff,
       |    round($SeSql, 4) + 0.0 AS se,
       |    round(($DiffSql + CAST($MarginCents AS DOUBLE))
       |      / nullif($SeSql, 0.0), 4) + 0.0 AS t_lower,
       |    round((CAST($MarginCents AS DOUBLE) - $DiffSql)
       |      / nullif($SeSql, 0.0), 4) + 0.0 AS t_upper
       |  FROM kept),
       |ps AS (
       |  SELECT g, n_a, n_b, delta_margin, diff, se, t_lower, t_upper,
       |    round(${pUpperSql("least(t_lower, t_upper)")}, 6) + 0.0
       |      AS p_equiv
       |  FROM tees)
       |SELECT g AS o_orderpriority, n_a, n_b, delta_margin, diff, se,
       |  t_lower, t_upper, p_equiv,
       |  CAST(CASE WHEN p_equiv < 0.05 THEN 1 ELSE 0 END AS BIGINT)
       |    AS equivalent
       |FROM ps""".stripMargin
}
