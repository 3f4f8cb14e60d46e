package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Granger causality, single lag — the directional question q116's
  * cross-correlation cannot answer: CCF says x and y co-move at some
  * lag; Granger asks "does KNOWING x yesterday improve the forecast
  * of y today BEYOND what y's own history gives?" — fit
  *
  *   y_t = a + b·y_{t−1} + c·x_{t−1},   H₀: c = 0
  *
  * and test the cross coefficient. For ONE restriction the classical
  * restricted-vs-unrestricted F equals t² of c exactly (nested models
  * differing by one parameter), so the operator runs one 3×3 solve
  * and reports t, F = t², and the large-sample normal p (df is weeks,
  * comfortably large on the registered series; documented rather than
  * fabricating an exact F tail).
  *
  * Exactness: the q207 3×3 Cramer program verbatim on q32-convention
  * fixed-point sums (per-row products floored to the 1e-6 grid,
  * DECIMAL(38,0)-summed — order-free); the solve/SE/t chain is ONE
  * shared-text rational+sqrt program; only the A&S erfc p touches
  * libm (exp — the shared q94/q100 chain on a round-4-snapped t).
  *
  * Plan/scale: each series is ONE corpus-touch weekly aggregate (the
  * q115 calendar-cell class — the joined/lagged frame is bounded by
  * the WEEK SPAN, never by fact rows), then an inner join on the week
  * spine, a spine-bounded lag window, one sum aggregate, a 1-row
  * finish. */
object Granger {

  /** Fixed-point snap scale (q32/q207 convention). */
  val FixedScale = 1000000.0

  private val Terms: Seq[(String, String)] = Seq(
    "sl" -> "ylag", "sx" -> "xlag", "sy" -> "y",
    "sll" -> "ylag * ylag", "slx" -> "ylag * xlag", "sxx" -> "xlag * xlag",
    "sly" -> "ylag * y", "sxy" -> "xlag * y", "syy" -> "y * y")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def recExprs: Seq[String] = Terms.map { case (n, _) =>
    s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
  }
  private def recSql: String = recExprs.mkString(", ")

  // 3×3 Cramer over A = [[n,sl,sx],[sl,sll,slx],[sx,slx,sxx]],
  // rhs = [sy,sly,sxy] (the q207 program with x→ylag, z→xlag)
  private val Nd = "CAST(n_weeks AS DOUBLE)"
  private val DetSql =
    s"($Nd * (sll * sxx - slx * slx) - sl * (sl * sxx - slx * sx)" +
      " + sx * (sl * slx - sll * sx))"
  private val Det0Sql =
    "(sy * (sll * sxx - slx * slx) - sl * (sly * sxx - slx * sxy)" +
      " + sx * (sly * slx - sll * sxy))"
  private val Det1Sql =
    s"($Nd * (sly * sxx - slx * sxy) - sy * (sl * sxx - slx * sx)" +
      " + sx * (sl * sxy - sly * sx))"
  private val Det2Sql =
    s"($Nd * (sll * sxy - sly * slx) - sl * (sl * sxy - sly * sx)" +
      " + sy * (sl * slx - sll * sx))"
  private val GuardSql =
    s"(n_weeks >= 5 AND abs($DetSql) > 1.0 / $FixedScale)"
  /** (A⁻¹)₃₃ numerator — the c cofactor. */
  private val M22Sql = s"($Nd * sll - sl * sl)"
  private val SseSql = "(syy - b0 * sy - b1 * sly - b2 * sxy)"

  /** Two-sided normal p via A&S 7.1.26 (the q94/q100 chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Granger test from a frame with (w, xs, ys): integer period and
    * the two series levels. One row: (n_weeks, b_ylag, c_xlag, se_cx,
    * t_granger, f_granger, p_approx) — NULLs when singular; se/t NULL
    * on an exact fit. */
  def grangerTest(rows: DataFrame): DataFrame = {
    val wWin = Window.orderBy("w")
    rows
      .selectExpr("w", "CAST(xs AS DOUBLE) AS xs", "CAST(ys AS DOUBLE) AS ys")
      .withColumn("ylag", lag("ys", 1).over(wWin))
      .withColumn("xlag", lag("xs", 1).over(wWin))
      .filter(col("ylag").isNotNull && col("xlag").isNotNull)
      .withColumn("y", col("ys"))
      .groupBy()
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_weeks"),
        Terms.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
      .selectExpr(Seq("n_weeks") ++ recExprs: _*)
      .selectExpr("n_weeks", "sy", "sly", "sxy", "syy",
        s"CASE WHEN $GuardSql THEN $Det0Sql / $DetSql END AS b0",
        s"CASE WHEN $GuardSql THEN $Det1Sql / $DetSql END AS b1",
        s"CASE WHEN $GuardSql THEN $Det2Sql / $DetSql END AS b2",
        s"CASE WHEN $GuardSql THEN $M22Sql / $DetSql END AS a33")
      .selectExpr("n_weeks", "b1", "b2",
        // greatest(·,0) before sqrt: q207 negative-SSE note
        s"sqrt(nullif(greatest($SseSql / ($Nd - 3.0) * a33," +
          " CAST(0.0 AS DOUBLE)), 0.0)) AS se_raw")
      .selectExpr("n_weeks",
        "round(b1, 6) + 0.0 AS b_ylag",
        "round(b2, 6) + 0.0 AS c_xlag",
        "round(coalesce(se_raw, CAST(0.0 AS DOUBLE)), 6) + 0.0 AS se_cx",
        "round(b2 / se_raw, 4) + 0.0 AS t_granger")
      .selectExpr("n_weeks", "b_ylag", "c_xlag", "se_cx", "t_granger",
        "round(t_granger * t_granger, 6) + 0.0 AS f_granger",
        s"round(${pSql("t_granger")}, 6) + 0.0 AS p_approx")
  }

  /** q211: does weekly ORDER revenue Granger-cause weekly SHIPPED
    * revenue — ordering leads shipping in the fulfilment chain, so
    * last week's order book should forecast this week's shipments
    * beyond shipment history alone (both series in M$). */
  def orderShipGranger(spark: SparkSession, dir: String): DataFrame = {
    val xw = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr(
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') div 7 AS w",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("w")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("xc"))
    val yw = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull && col("l_extendedprice").isNotNull)
      .selectExpr(
        "datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') div 7 AS w",
        "CAST(floor(l_extendedprice * 1e2) AS BIGINT) AS cents")
      .groupBy("w")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("yc"))
    grangerTest(xw.join(yw, "w")
      .selectExpr("w", "CAST(xc AS DOUBLE) / 1e8 AS xs",
        "CAST(yc AS DOUBLE) / 1e8 AS ys"))
  }

  /** DuckDB twin: identical weekly cells, lag pairs, Cramer solve,
    * shared t/F/p chain. */
  val orderShipGrangerSql: String = {
    val sums = Terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t).replace("DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT) AS ${n}_i"
    }.mkString(",\n       |    ")
    s"""WITH xw AS (
       |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7 AS w,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS xc
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |yw AS (
       |  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) // 7 AS w,
       |    CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)) AS BIGINT) AS yc
       |  FROM lineitem
       |  WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
       |  GROUP BY 1),
       |ser AS (
       |  SELECT w, CAST(xc AS DOUBLE) / 1e8 AS xs, CAST(yc AS DOUBLE) / 1e8 AS ys
       |  FROM xw JOIN yw USING (w)),
       |lagged AS (
       |  SELECT ys AS y,
       |    lag(ys) OVER (ORDER BY w) AS ylag,
       |    lag(xs) OVER (ORDER BY w) AS xlag
       |  FROM ser),
       |pairs AS (SELECT * FROM lagged WHERE ylag IS NOT NULL AND xlag IS NOT NULL),
       |sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_weeks,
       |    $sums
       |  FROM pairs),
       |rec AS (SELECT n_weeks, $recSql FROM sums),
       |solved AS (
       |  SELECT n_weeks, sy, sly, sxy, syy,
       |    CASE WHEN $GuardSql THEN $Det0Sql / $DetSql END AS b0,
       |    CASE WHEN $GuardSql THEN $Det1Sql / $DetSql END AS b1,
       |    CASE WHEN $GuardSql THEN $Det2Sql / $DetSql END AS b2,
       |    CASE WHEN $GuardSql THEN $M22Sql / $DetSql END AS a33
       |  FROM rec),
       |sed AS (
       |  SELECT n_weeks, b1, b2,
       |    sqrt(nullif(greatest($SseSql / ($Nd - 3.0) * a33,
       |      CAST(0.0 AS DOUBLE)), 0.0)) AS se_raw
       |  FROM solved),
       |fin AS (
       |  SELECT n_weeks,
       |    round(b1, 6) + 0.0 AS b_ylag,
       |    round(b2, 6) + 0.0 AS c_xlag,
       |    round(coalesce(se_raw, CAST(0.0 AS DOUBLE)), 6) + 0.0 AS se_cx,
       |    round(b2 / se_raw, 4) + 0.0 AS t_granger
       |  FROM sed)
       |SELECT n_weeks, b_ylag, c_xlag, se_cx, t_granger,
       |  round(t_granger * t_granger, 6) + 0.0 AS f_granger,
       |  round(${pSql("t_granger")}, 6) + 0.0 AS p_approx
       |FROM fin""".stripMargin
  }
}
