package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mahalanobis outlier audit — the MULTIVARIATE member of the outlier
  * deck. q71 MAD and q214 Grubbs read one column at a time, so a row
  * whose (quantity, price) pair is impossible while each coordinate is
  * ordinary (small quantity at a bulk price) sails through both. With
  * the group's mean vector μ and covariance Σ,
  *
  *   d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ)  ~  χ²₂ under normality
  *
  * so d² > 9.2103 flags the 1% joint tail in the metric the
  * correlation itself defines.
  *
  * Exactness: the five moment sums are per-row 1e-6-floored
  * DECIMAL(38,0) integers (order-free, the q68 stance); μ, Σ, det and
  * the 2×2 inverse ride ONE shared-text rational chain, and each
  * row's d² is floored to integer micro-units so the χ² threshold and
  * the max are INTEGER comparisons in both engines.
  *
  * Plan/scale: exactly two corpus passes (the q8 z-score shape) — a
  * map-side-combined moment aggregate, then a distance scan with the
  * per-group fit broadcast back. No window, no shuffle beyond the
  * group aggregates; group count never multiplies passes. */
object Mahalanobis {

  val FixedScale = 1000000.0

  /** χ²₂ 99% critical value on the micro grid. */
  val Chi2Crit99Micro = 9210340L

  private val Moments: Seq[(String, String)] = Seq(
    "s1" -> "x1", "s2" -> "x2", "s11" -> "x1 * x1",
    "s22" -> "x2 * x2", "s12" -> "x1 * x2")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def recExprs: Seq[String] =
    Moments.map { case (n, _) => s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n" }

  private val Nd = "CAST(n_rows AS DOUBLE)"
  /** Population covariance entries over recovered doubles. */
  private val C11 = s"(s11 / $Nd - (s1 / $Nd) * (s1 / $Nd))"
  private val C22 = s"(s22 / $Nd - (s2 / $Nd) * (s2 / $Nd))"
  private val C12 = s"(s12 / $Nd - (s1 / $Nd) * (s2 / $Nd))"
  private val DetSql = "(c11 * c22 - c12 * c12)"
  /** d² from centered (a, b) and the adjugate — micro-floored. */
  private val D2Sql =
    "((a * a * c22 - 2.0 * a * b * c12 + b * b * c11) / det)"

  /** Mahalanobis audit per group from (g, x1, x2). One row per group:
    * (g, n_rows, max_d2, n_out99, out_ppm) — groups with a singular
    * covariance (n < 3 or collinear columns) are reported with NULL
    * distance columns. */
  def mahalanobisAudit(rows: DataFrame): DataFrame = {
    val pts = rows
      .filter(col("x1").isNotNull && col("x2").isNotNull)
      .selectExpr("g", "CAST(x1 AS DOUBLE) AS x1", "CAST(x2 AS DOUBLE) AS x2")
      .localCheckpoint(true) // moment pass + distance pass
    val fit = pts.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        Moments.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
      .selectExpr(Seq("g", "n_rows") ++ recExprs: _*)
      .selectExpr("g", "n_rows", "s1", "s2",
        s"$C11 AS c11", s"$C22 AS c22", s"$C12 AS c12")
      .selectExpr("g", "n_rows", "s1", "s2", "c11", "c22", "c12",
        s"CASE WHEN n_rows >= 3 AND abs($DetSql) > 1e-9" +
          s" THEN $DetSql END AS det")
    pts
      .join(broadcast(fit), "g")
      .withColumn("a", expr(s"x1 - s1 / $Nd"))
      .withColumn("b", expr(s"x2 - s2 / $Nd"))
      .withColumn("d2_micro", expr(
        s"CAST(floor($D2Sql * 1e6) AS BIGINT)"))
      .groupBy("g", "n_rows")
      .agg(
        max("d2_micro").as("max_d2m"),
        sum(expr(
          s"CAST(d2_micro > $Chi2Crit99Micro AS BIGINT)")).as("n_out99"))
      .selectExpr("g", "n_rows",
        "round(CAST(max_d2m AS DOUBLE) / 1e6, 4) + 0.0 AS max_d2",
        "n_out99", "n_out99 * 1000000 div n_rows AS out_ppm")
  }

  /** q284: joint (quantity, extended price) outliers per return flag —
    * the bulk-price-at-retail-quantity rows neither q71 nor q214 can
    * see. */
  def lineitemMahalanobis(spark: SparkSession, dir: String): DataFrame =
    mahalanobisAudit(Tables.lineitem(spark, dir)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .selectExpr("l_returnflag AS g", "l_quantity AS x1",
        "l_extendedprice / 1000.0 AS x2"))
      .withColumnRenamed("g", "l_returnflag")

  /** DuckDB twin: identical moments, shared inverse, integer
    * threshold/max. */
  val lineitemMahalanobisSql: String = {
    val momentSums = Moments.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t).replace("DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT) AS ${n}_i"
    }.mkString(",\n       |    ")
    s"""WITH pts AS (
       |  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x1,
       |    CAST(l_extendedprice / 1000.0 AS DOUBLE) AS x2
       |  FROM lineitem
       |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
       |sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    $momentSums
       |  FROM pts GROUP BY 1),
       |rec AS (SELECT g, n_rows, ${recExprs.mkString(", ")} FROM sums),
       |cov AS (
       |  SELECT g, n_rows, s1, s2,
       |    $C11 AS c11, $C22 AS c22, $C12 AS c12
       |  FROM rec),
       |fit AS (
       |  SELECT g, n_rows, s1, s2, c11, c22, c12,
       |    CASE WHEN n_rows >= 3 AND abs($DetSql) > 1e-9
       |      THEN $DetSql END AS det
       |  FROM cov),
       |dist AS (
       |  SELECT p.g, n_rows,
       |    CAST(floor($D2Sql * 1e6) AS BIGINT) AS d2_micro
       |  FROM (
       |    SELECT p0.g, n_rows, det, c11, c22, c12,
       |      x1 - s1 / $Nd AS a, x2 - s2 / $Nd AS b
       |    FROM pts p0 JOIN fit ON p0.g = fit.g) p)
       |SELECT g AS l_returnflag, n_rows,
       |  round(CAST(max(d2_micro) AS DOUBLE) / 1e6, 4) + 0.0 AS max_d2,
       |  CAST(sum(CAST(d2_micro > $Chi2Crit99Micro AS BIGINT)) AS BIGINT)
       |    AS n_out99,
       |  CAST(sum(CAST(d2_micro > $Chi2Crit99Micro AS BIGINT)) AS BIGINT)
       |    * 1000000 // n_rows AS out_ppm
       |FROM dist GROUP BY 1, 2""".stripMargin
  }
}
