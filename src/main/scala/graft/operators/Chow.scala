package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Chow structural-break test at a KNOWN breakpoint — the companion
  * INFERENCE to q207's segmented fit, asking a stronger question:
  * q207 tests whether the SLOPE kinked (continuous hinge); Chow tests
  * whether the whole regression (intercept AND slope) is the same
  * regime on both sides of T:
  *
  *   F = ((SSR_pooled − SSR₁ − SSR₂)/2) / ((SSR₁+SSR₂)/(n−4))
  *
  * — F(2, n−4) under H₀ (line documented, not fabricated — the q210
  * convention; at the registered n ≈ 2400/group the 5% line is
  * ≈ 3.00).
  *
  * Exactness: the q32/q207 fixed-point discipline — per-row terms
  * floored to the 1e-6 grid, summed as DECIMAL(38,0) per SEGMENT via
  * CASE (one aggregate, 12 sums); each SSR is the classical
  * closed form (Syy − Sy²/n) − (Sxy − SxSy/n)²/(Sxx − Sx²/n) as ONE
  * shared-text chain on exactly-recovered doubles; the pooled sums
  * are exact integer ADDS of the two segment sums — no second scan.
  * Degenerates → NULL: a side with < 3 points or zero x-variance
  * (can't fit), or a zero split-SSR (an exact two-line fit has
  * infinite evidence — the q209 exact-fit convention).
  *
  * Plan/scale: one corpus-touch daily aggregate → ONE keyed aggregate
  * with CASE-split sums → 1-row-per-group finish. No windows, no
  * joins back. */
object Chow {

  val FixedScale = 1000000.0

  private val Terms: Seq[(String, String)] = Seq(
    "sx" -> "x", "sy" -> "y", "sxx" -> "x * x", "sxy" -> "x * y",
    "syy" -> "y * y")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"

  /** segment seg ∈ {a, b, p} (p = pooled: a+b integer adds) */
  private def ssrSql(seg: String): String = {
    def c(n: String) = s"(CAST(${n}_$seg AS DOUBLE) / $FixedScale)"
    val nd = s"CAST(n_$seg AS DOUBLE)"
    val syyC = s"(${c("syy")} - ${c("sy")} * ${c("sy")} / $nd)"
    val sxyC = s"(${c("sxy")} - ${c("sx")} * ${c("sy")} / $nd)"
    val sxxC = s"(${c("sxx")} - ${c("sx")} * ${c("sx")} / $nd)"
    s"($syyC - $sxyC * $sxyC / $sxxC)"
  }
  private def sxxCSql(seg: String): String = {
    def c(n: String) = s"(CAST(${n}_$seg AS DOUBLE) / $FixedScale)"
    s"(${c("sxx")} - ${c("sx")} * ${c("sx")} / CAST(n_$seg AS DOUBLE))"
  }
  private val GuardSql =
    s"(n_a >= 3 AND n_b >= 3 AND ${sxxCSql("a")} > 0e0" +
      s" AND ${sxxCSql("b")} > 0e0 AND ${sxxCSql("p")} > 0e0)"
  // greatest(·, 0): snapped sums can leave a near-exact SSR a hair
  // negative, and the SPLIT total must stay a legal denominator
  private def pos(e: String): String =
    s"greatest($e, CAST(0.0 AS DOUBLE))"
  private val FSql =
    s"((${pos("ssr_p")} - ssr_s) / 2.0)" +
      s" / nullif(ssr_s / (CAST(n_a + n_b AS DOUBLE) - 4.0), 0e0)"

  /** Chow F per group from (g, x, y, tb): position, response, known
    * per-group break (x ≤ tb = segment a). One row per group:
    * (g, n_pre, n_post, t_break, ssr_split, ssr_pooled, f_chow). */
  def chow(rows: DataFrame): DataFrame = {
    val segAggs = Seq("a", "b").flatMap { seg =>
      val cond = if (seg == "a") "x <= tb" else "x > tb"
      expr(s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT)")
        .as(s"n_$seg") +:
        Terms.map { case (n, t) =>
          expr(s"CAST(sum(CASE WHEN $cond THEN ${fixedSql(t)} END)" +
            s" AS DECIMAL(38,0))").as(s"${n}_$seg")
        }
    }
    val pooled = Seq("CAST(n_a + n_b AS BIGINT) AS n_p") ++
      Terms.map { case (n, _) => s"${n}_a + ${n}_b AS ${n}_p" }
    rows
      .selectExpr("g", "tb", "CAST(x AS DOUBLE) AS x", "CAST(y AS DOUBLE) AS y")
      .groupBy("g")
      .agg(expr("CAST(max(tb) AS BIGINT)").as("t_break"), segAggs: _*)
      .selectExpr(Seq("g", "t_break", "n_a", "n_b") ++
        Seq("a", "b").flatMap(s => Terms.map { case (n, _) => s"${n}_$s" }) ++
        pooled: _*)
      .selectExpr("g", "t_break", "n_a", "n_b",
        s"CASE WHEN $GuardSql THEN ${pos(s"(${ssrSql("a")} + ${ssrSql("b")})")}" +
          " END AS ssr_s",
        s"CASE WHEN $GuardSql THEN ${ssrSql("p")} END AS ssr_p")
      .selectExpr("g", "n_a AS n_pre", "n_b AS n_post", "t_break",
        "round(ssr_s, 4) + 0.0 AS ssr_split",
        s"round(${pos("ssr_p")}, 4) + 0.0 AS ssr_pooled",
        s"CASE WHEN ssr_s > 0e0 THEN round($FSql, 4) + 0.0 END AS f_chow")
  }

  /** q222: is daily revenue the SAME regime before and after the
    * span midpoint, per priority — the q207 frame (y in k$, x = day
    * index, T = global midpoint) under the two-regime question. */
  def revenueRegimeChow(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("g", "d")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("rev"))
      .localCheckpoint(true) // span + fit both read it
    val span = daily.agg(min("d").as("d0"), max("d").as("d1"))
    chow(daily
      .crossJoin(broadcast(span))
      .selectExpr("g", "CAST(d - d0 AS BIGINT) AS x",
        "CAST(rev AS DOUBLE) / 1e5 AS y",
        "CAST((d1 - d0) AS BIGINT) div 2 AS tb"))
      .withColumnRenamed("g", "o_orderpriority")
  }

  /** DuckDB twin: identical CASE-split fixed-point sums and chains. */
  val revenueRegimeChowSql: String = {
    val segSums = Seq("a", "b").flatMap { seg =>
      val cond = if (seg == "a") "x <= tb" else "x > tb"
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS n_$seg" +:
        Terms.map { case (n, t) =>
          s"CAST(sum(CASE WHEN $cond THEN ${fixedSql(t).replace("DECIMAL(38,0)", "HUGEINT")} END) AS HUGEINT) AS ${n}_$seg"
        }
    }.mkString(",\n       |    ")
    val pooled = (Seq("CAST(n_a + n_b AS BIGINT) AS n_p") ++
      Terms.map { case (n, _) => s"${n}_a + ${n}_b AS ${n}_p" })
      .mkString(",\n       |    ")
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
       |    (d1 - d0) // 2 AS tb
       |  FROM daily CROSS JOIN span),
       |sums AS (
       |  SELECT g, CAST(max(tb) AS BIGINT) AS t_break,
       |    $segSums
       |  FROM pts GROUP BY 1),
       |withp AS (
       |  SELECT *,
       |    $pooled
       |  FROM sums),
       |ssr AS (
       |  SELECT g, t_break, n_a, n_b,
       |    CASE WHEN $GuardSql THEN ${pos(s"(${ssrSql("a")} + ${ssrSql("b")})")}
       |      END AS ssr_s,
       |    CASE WHEN $GuardSql THEN ${ssrSql("p")} END AS ssr_p
       |  FROM withp)
       |SELECT g AS o_orderpriority, n_a AS n_pre, n_b AS n_post, t_break,
       |  round(ssr_s, 4) + 0.0 AS ssr_split,
       |  round(${pos("ssr_p")}, 4) + 0.0 AS ssr_pooled,
       |  CASE WHEN ssr_s > 0e0 THEN round($FSql, 4) + 0.0 END AS f_chow
       |FROM ssr""".stripMargin
  }
}
