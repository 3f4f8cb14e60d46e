package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Segmented (broken-stick) regression at a KNOWN breakpoint — the
  * inference rung under the changepoint deck: q105/q134/q174 DETECT
  * where a series shifts; once a candidate break T is on the table,
  * the question becomes "did the SLOPE actually change at T, and by
  * how much?" — the hinge model
  *
  *   y = b₀ + b₁·x + b₂·max(0, x − T),   H₀: b₂ = 0
  *
  * with t = b₂/SE(b₂) from the 3×3 normal equations — the classical
  * piecewise-linear test (Hinkley 1971 fixed-knot case).
  *
  * Exactness: the q32/q164 fixed-point discipline — every
  * sufficient-statistic product is floored onto the 1e-6 grid per row
  * and summed as DECIMAL(38,0) (order-free), the 3×3 Cramer solve,
  * SSE and the SE chain are ONE shared-text rational program (no
  * exp/ln — nothing to snap), so both engines agree bitwise.
  *
  * Plan/scale: the registered query fits over a CALENDAR-bounded
  * day-cell frame (one corpus-touch daily aggregate, the q115 spine
  * class) — the fit itself is one keyed aggregate + a 1-row-per-group
  * finish; a thousand group fits cost the same two shuffles. */
object SegmentedReg {

  /** Fixed-point snap scale for sufficient-statistic terms (q164). */
  val FixedScale = 1000000.0

  private val Terms: Seq[(String, String)] = Seq(
    "sx" -> "x", "sz" -> "z", "sy" -> "y",
    "sxx" -> "x * x", "sxz" -> "x * z", "szz" -> "z * z",
    "sxy" -> "x * y", "szy" -> "z * y", "syy" -> "y * y")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def recExprs: Seq[String] = Terms.map { case (n, _) =>
    s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
  }
  private def recSql: String = recExprs.mkString(", ")

  // 3×3 Cramer over A = [[n,sx,sz],[sx,sxx,sxz],[sz,sxz,szz]],
  // c = [sy,sxy,szy] (shared text; nd = n as double)
  private val Nd = "CAST(n_rows AS DOUBLE)"
  private val DetSql =
    s"($Nd * (sxx * szz - sxz * sxz) - sx * (sx * szz - sxz * sz)" +
      " + sz * (sx * sxz - sxx * sz))"
  private val Det0Sql = // b0 column
    "(sy * (sxx * szz - sxz * sxz) - sx * (sxy * szz - sxz * szy)" +
      " + sz * (sxy * sxz - sxx * szy))"
  private val Det1Sql = // b1 column
    s"($Nd * (sxy * szz - sxz * szy) - sy * (sx * szz - sxz * sz)" +
      " + sz * (sx * szy - sxy * sz))"
  private val Det2Sql = // b2 column
    s"($Nd * (sxx * szy - sxy * sxz) - sx * (sx * szy - sxy * sz)" +
      " + sy * (sx * sxz - sxx * sz))"
  private val GuardSql =
    s"(n_rows >= 4 AND abs($DetSql) > 1.0 / $FixedScale)"
  /** (A⁻¹)₃₃ numerator — the b₂ cofactor. */
  private val M22Sql = s"($Nd * sxx - sx * sx)"
  private val SseSql = "(syy - b0 * sy - b1 * sxy - b2 * szy)"

  /** Hinge fit per group from a frame with (g, x, y, tb): integer
    * position, double response, per-group integer breakpoint. One row
    * per group: (g, n_rows, t_break, b0, b1_pre, b2_change,
    * slope_post, se_b2, t_b2) — NULLs when singular (too few points,
    * or no points on one side of the break); se/t NULL on an exact
    * fit (zero residual). */
  def segmentedFit(rows: DataFrame): DataFrame =
    rows
      .selectExpr("g", "tb", "CAST(x AS DOUBLE) AS x", "y")
      .withColumn("z", expr("greatest(CAST(0.0 AS DOUBLE), x - tb)"))
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        (expr("CAST(max(tb) AS BIGINT)").as("t_break") +: Terms.map {
          case (n, t) =>
            expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }): _*)
      .selectExpr(Seq("g", "n_rows", "t_break") ++ recExprs: _*)
      .selectExpr("g", "n_rows", "t_break", "sy", "sxy", "szy", "syy",
        s"CASE WHEN $GuardSql THEN $Det0Sql / $DetSql END AS b0",
        s"CASE WHEN $GuardSql THEN $Det1Sql / $DetSql END AS b1",
        s"CASE WHEN $GuardSql THEN $Det2Sql / $DetSql END AS b2",
        s"CASE WHEN $GuardSql THEN $M22Sql / $DetSql END AS a33")
      .selectExpr("g", "n_rows", "t_break", "b0", "b1", "b2",
        // greatest(·,0) before the sqrt: an exact fit's SSE can land
        // a hair negative off the snapped sums, and DuckDB ERRORS on
        // a negative sqrt where Spark would quietly NaN
        s"sqrt(nullif(greatest($SseSql / (CAST(n_rows AS DOUBLE) - 3.0)" +
          " * a33, CAST(0.0 AS DOUBLE)), 0.0)) AS se_raw")
      .selectExpr("g", "n_rows", "t_break",
        "round(b0, 6) + 0.0 AS b0",
        "round(b1, 6) + 0.0 AS b1_pre",
        "round(b2, 6) + 0.0 AS b2_change",
        "round(b1 + b2, 6) + 0.0 AS slope_post",
        "round(coalesce(se_raw, CAST(0.0 AS DOUBLE)), 6) + 0.0 AS se_b2",
        "round(b2 / se_raw, 4) + 0.0 AS t_b2")

  /** q207: did the DAILY-REVENUE slope change at the dataset's
    * midpoint day, per priority — the q115 day spine asked the
    * Hinkley question; y in k$ (the q32/q164 feature-scale note),
    * x = day index, T = the global midpoint. */
  def revenueSlopeChange(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("g", "d")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("rev"))
      .localCheckpoint(true) // spine bounds + the fit both read it
    val span = daily.agg(min("d").as("d0"), max("d").as("d1"))
    segmentedFit(daily
      .crossJoin(broadcast(span))
      .selectExpr("g", "CAST(d - d0 AS BIGINT) AS x",
        "CAST(rev AS DOUBLE) / 1e5 AS y",
        "CAST((d1 - d0) div 2 AS BIGINT) AS tb"))
      .withColumnRenamed("g", "o_orderpriority")
  }

  /** DuckDB twin: identical day cells, snapped sums, Cramer solve,
    * SE chain. */
  val revenueSlopeChangeSql: String = {
    val sums = Terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t).replace("DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT) AS ${n}_i"
    }.mkString(",\n       |    ")
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS rev
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
       |pts AS (
       |  SELECT g, CAST(d - d0 AS DOUBLE) AS x,
       |    CAST(rev AS DOUBLE) / 1e5 AS y,
       |    CAST((d1 - d0) // 2 AS BIGINT) AS tb
       |  FROM daily CROSS JOIN span),
       |hinged AS (
       |  SELECT g, tb, x, y,
       |    greatest(CAST(0.0 AS DOUBLE), x - tb) AS z
       |  FROM pts),
       |sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(max(tb) AS BIGINT) AS t_break,
       |    $sums
       |  FROM hinged GROUP BY 1),
       |rec AS (
       |  SELECT g, n_rows, t_break, $recSql FROM sums),
       |solved AS (
       |  SELECT g, n_rows, t_break, sy, sxy, szy, syy,
       |    CASE WHEN $GuardSql THEN $Det0Sql / $DetSql END AS b0,
       |    CASE WHEN $GuardSql THEN $Det1Sql / $DetSql END AS b1,
       |    CASE WHEN $GuardSql THEN $Det2Sql / $DetSql END AS b2,
       |    CASE WHEN $GuardSql THEN $M22Sql / $DetSql END AS a33
       |  FROM rec),
       |sed AS (
       |  SELECT g, n_rows, t_break, b0, b1, b2,
       |    sqrt(nullif(greatest($SseSql / (CAST(n_rows AS DOUBLE) - 3.0)
       |      * a33, CAST(0.0 AS DOUBLE)), 0.0)) AS se_raw
       |  FROM solved)
       |SELECT g AS o_orderpriority, n_rows, t_break,
       |  round(b0, 6) + 0.0 AS b0,
       |  round(b1, 6) + 0.0 AS b1_pre,
       |  round(b2, 6) + 0.0 AS b2_change,
       |  round(b1 + b2, 6) + 0.0 AS slope_post,
       |  round(coalesce(se_raw, CAST(0.0 AS DOUBLE)), 6) + 0.0 AS se_b2,
       |  round(b2 / se_raw, 4) + 0.0 AS t_b2
       |FROM sed""".stripMargin
  }
}
