package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cohen's d + Hedges' g — the PARAMETRIC effect size beside q96's
  * Welch t: the t statistic grows with √n (any true difference goes
  * "significant" at corpus scale); d is the difference in POOLED
  * standard-deviation units, the scale power analyses and
  * meta-analyses actually use, with Hedges' small-sample correction
  * J = 1 − 3/(4N − 9):
  *
  *   d = (x̄₁ − x̄₂) / s_p,   s_p² = ((n₁−1)s₁² + (n₂−1)s₂²)/(N − 2)
  *   g = J·d
  *
  * and the conventional magnitude bands (|d| < 0.2 negligible, < 0.5
  * small, < 0.8 medium, else large) as a column.
  *
  * Exactness: the q96 cent-grid cells — per-class (n, Σv, Σv²) exact
  * integers from ONE aggregate; d/g are shared-text chains on
  * exactly-recovered doubles (cleared variances, the q134 rule);
  * a side with n < 2 or zero pooled variance → NULL.
  *
  * Plan/scale: one corpus-touch CASE-split keyed aggregate →
  * 1-row-per-group finish. No windows, no joins. */
object EffectSize {

  // nullif denominators: ANSI codegen evaluates the guard's
  // subexpressions eagerly, so a bare /0 on a 1-row side would THROW
  // before the boolean short-circuit; NULL propagates to a false
  // guard instead (n_a >= 2 AND ... — never a NULL verdict)
  private def varC(s: String): String =
    s"((n${s}d * sxx_$s - sx_$s * sx_$s)" +
      s" / nullif(n${s}d * (n${s}d - 1.0), 0e0))"
  private val SpSql =
    s"sqrt(((nad - 1.0) * ${varC("a")} + (nbd - 1.0) * ${varC("b")})" +
      " / nullif(nad + nbd - 2.0, 0e0))"
  private val DSql =
    s"((sx_a / nad - sx_b / nbd) / nullif($SpSql, 0e0))"
  private val JSql = "(1.0 - 3.0 / (4.0 * (nad + nbd) - 9.0))"
  private val GuardSql =
    s"(n_a >= 2 AND n_b >= 2 AND $SpSql > 0e0)"
  private val OutSql = Seq(
    s"CASE WHEN $GuardSql THEN round($DSql, 6) + 0.0 END AS cohens_d",
    s"CASE WHEN $GuardSql THEN round($JSql * $DSql, 6) + 0.0 END AS hedges_g",
    s"CASE WHEN NOT $GuardSql THEN NULL" +
      s" WHEN abs($DSql) < 0.2 THEN 'negligible'" +
      s" WHEN abs($DSql) < 0.5 THEN 'small'" +
      s" WHEN abs($DSql) < 0.8 THEN 'medium'" +
      " ELSE 'large' END AS magnitude")

  /** d/g of `valueCol` (cent-floored) between `clsA` and `clsB` per
    * `groupCol`. One row per group: (group, n_a, n_b, cohens_d,
    * hedges_g, magnitude). */
  def effectSize(df: DataFrame, groupCol: String, classCol: String,
      clsA: String, clsB: String, valueCol: String,
      scale: String = "1e2"): DataFrame = {
    val sums = Seq("a" -> clsA, "b" -> clsB).flatMap { case (s, c) => Seq(
      expr(s"CAST(sum(CASE WHEN cls = '$c' THEN 1 ELSE 0 END) AS BIGINT)")
        .as(s"n_$s"),
      expr(s"CAST(sum(CASE WHEN cls = '$c' THEN v END) AS DECIMAL(38,0))")
        .as(s"sxi_$s"),
      expr(s"CAST(sum(CASE WHEN cls = '$c' THEN CAST(v AS DECIMAL(38,0)) * v" +
        s" END) AS DECIMAL(38,0))").as(s"sxxi_$s"))
    }
    df
      .filter(col(classCol).isin(clsA, clsB) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(classCol).as("cls"),
        expr(s"CAST(floor($valueCol * $scale) AS BIGINT)").as("v"))
      .groupBy("g")
      .agg(sums.head, sums.tail: _*)
      .selectExpr("g", "n_a", "n_b",
        "CAST(n_a AS DOUBLE) AS nad", "CAST(n_b AS DOUBLE) AS nbd",
        "CAST(sxi_a AS DOUBLE) AS sx_a", "CAST(sxi_b AS DOUBLE) AS sx_b",
        "CAST(sxxi_a AS DOUBLE) AS sxx_a", "CAST(sxxi_b AS DOUBLE) AS sxx_b")
      .selectExpr(Seq(s"g AS $groupCol", "n_a", "n_b") ++ OutSql: _*)
  }

  /** q225: how LARGE is the fulfilled-vs-open order-value difference
    * per priority — the magnitude next to q96's verdict on the same
    * frame and cent grid. */
  def orderEffectSize(spark: SparkSession, dir: String): DataFrame =
    effectSize(Tables.orders(spark, dir),
      "o_orderpriority", "o_orderstatus", "F", "O", "o_totalprice")

  /** DuckDB twin: identical CASE-split integer cells and chains. */
  val orderEffectSizeSql: String = {
    val sums = Seq("a" -> "F", "b" -> "O").flatMap { case (s, c) => Seq(
      s"CAST(sum(CASE WHEN cls = '$c' THEN 1 ELSE 0 END) AS BIGINT) AS n_$s",
      s"CAST(sum(CASE WHEN cls = '$c' THEN v END) AS HUGEINT) AS sxi_$s",
      s"CAST(sum(CASE WHEN cls = '$c' THEN CAST(v AS HUGEINT) * v END)" +
        s" AS HUGEINT) AS sxxi_$s")
    }.mkString(",\n       |    ")
    s"""WITH prep AS (
       |  SELECT o_orderpriority AS g, o_orderstatus AS cls,
       |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS v
       |  FROM orders
       |  WHERE o_orderstatus IN ('F', 'O') AND o_totalprice IS NOT NULL),
       |agg AS (
       |  SELECT g,
       |    $sums
       |  FROM prep GROUP BY 1),
       |rec AS (
       |  SELECT g, n_a, n_b,
       |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
       |    CAST(sxi_a AS DOUBLE) AS sx_a, CAST(sxi_b AS DOUBLE) AS sx_b,
       |    CAST(sxxi_a AS DOUBLE) AS sxx_a, CAST(sxxi_b AS DOUBLE) AS sxx_b
       |  FROM agg)
       |SELECT g AS o_orderpriority, n_a, n_b,
       |  ${OutSql.mkString(",\n  ")}
       |FROM rec""".stripMargin
  }
}
