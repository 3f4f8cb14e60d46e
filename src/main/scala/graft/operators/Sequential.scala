package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Group-sequential A/B monitoring with an O'Brien–Fleming-shaped
  * boundary — the peeking-safe experiment readout: looking at a
  * conventional z = 1.96 test K times inflates false positives to
  * ~14% at K = 5; the OBF design spends almost no α early (boundary
  * b(t) = C/√t is very strict at small information fractions t) so
  * the full-information look keeps nearly the nominal level. The
  * K = 5, α = 0.05 two-sided OBF constant C = 2.040 gives the classic
  * boundary sequence 4.56, 3.23, 2.63, 2.28, 2.04 at equal
  * information steps; callers monitoring other designs pass their own
  * C. Composes with q132 (the single-look z), q152 (CUPED tightens
  * the z), and q100 (many-variant families).
  *
  * Semantics: units accrue over calendar LOOKS (here: order years —
  * the natural "analysis at the end of each period" cadence);
  * at each look the test sees the CUMULATIVE per-arm counts; the
  * information fraction is the exact unit-count ratio; a look crosses
  * when |z| exceeds its boundary, and the DECISION look is the first
  * crossing.
  *
  * Exactness: arms are seeded hash48 buckets; cumulative counts are
  * exact integers via a K-row window (looks are calendar-bounded —
  * dimension-grade by construction); z and boundary are shared-text
  * doubles from those integers; the crossing comparison runs on the
  * identical unrounded doubles in both engines.
  *
  * Plan/scale: one scan → per-(look, arm) aggregate (map-side
  * combined) → K-row cumulative window → 1-row totals broadcast —
  * nothing data-sized past the first aggregate.
  */
object Sequential {

  /** Assignment seed. */
  val Seed = 153

  /** K = 5, α = 0.05 two-sided OBF constant (b(t) = C/√t). */
  val ObfC = "2.040"

  private val ZSql =
    "(CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)" +
      " / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))" +
      " * (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb))" +
      " * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))"
  private val TSql = "CAST(na + nb AS DOUBLE) / total_n"
  private def boundSql(c: String) = s"($c / sqrt($TSql))"

  /** q153: monitor "do the two hash arms finish orders at the same
    * rate" across yearly looks (an A/A read on real data — the
    * boundary should NOT cross; the spec plants an effect to see it
    * cross). */
  def orderFinishMonitor(spark: SparkSession, dir: String,
      c: String = ObfC): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderstatus").isNotNull)
      .selectExpr("year(CAST(o_orderdate AS DATE)) AS look",
        s"CAST(${"hash48(concat('" + Seed + ":', CAST(o_orderkey AS STRING)))"} % 2 AS INT) AS t",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv")
      .groupBy("look")
      .agg(sum(expr("t")).cast("long").as("dnb"),
        sum(expr("CASE WHEN t = 1 THEN conv ELSE 0 END")).cast("long").as("dxb"),
        sum(expr("1 - t")).cast("long").as("dna"),
        sum(expr("CASE WHEN t = 0 THEN conv ELSE 0 END")).cast("long").as("dxa"))
    val wCum = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("na", sum(col("dna")).over(wCum))
      .withColumn("xa", sum(col("dxa")).over(wCum))
      .withColumn("nb", sum(col("dnb")).over(wCum))
      .withColumn("xb", sum(col("dxb")).over(wCum))
      .select("look", "na", "xa", "nb", "xb")
    val totals = cum.agg(max(col("na") + col("nb")).as("total_n"))
    val looks = cum.crossJoin(broadcast(totals))
      .selectExpr("look", "na", "xa", "nb", "xb",
        s"round($TSql, 4) + 0.0 AS t_frac",
        s"$ZSql AS z0",
        s"${boundSql(c)} AS bound0")
      .selectExpr("look", "na", "xa", "nb", "xb", "t_frac", "z0", "bound0",
        "abs(z0) > bound0 AS crossed")
    val firstCross = looks.agg(
      min(expr("CASE WHEN crossed THEN look END")).as("dlook"))
    looks.crossJoin(broadcast(firstCross))
      .selectExpr("look", "na", "xa", "nb", "xb", "t_frac",
        "round(z0, 4) + 0.0 AS z",
        "round(bound0, 4) + 0.0 AS bound", "crossed",
        "CASE WHEN dlook IS NOT NULL AND look = dlook THEN true" +
          " ELSE false END AS is_decision")
      .orderBy("look")
  }

  /** DuckDB twin: identical looks, cumulative window, shared z /
    * boundary text. */
  val orderFinishMonitorSql: String = {
    val h = Hashing.hash48Sql(Seed, "(o_orderkey)::VARCHAR")
    s"""WITH cells AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS look,
       |    CAST(sum(t) AS BIGINT) AS dnb,
       |    CAST(sum(CASE WHEN t = 1 THEN conv ELSE 0 END) AS BIGINT) AS dxb,
       |    CAST(sum(1 - t) AS BIGINT) AS dna,
       |    CAST(sum(CASE WHEN t = 0 THEN conv ELSE 0 END) AS BIGINT) AS dxa
       |  FROM (
       |    SELECT o_orderdate, CAST($h % 2 AS INT) AS t,
       |      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv
       |    FROM orders
       |    WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL)
       |  GROUP BY 1),
       |cum AS (
       |  SELECT look,
       |    CAST(sum(dna) OVER w AS BIGINT) AS na,
       |    CAST(sum(dxa) OVER w AS BIGINT) AS xa,
       |    CAST(sum(dnb) OVER w AS BIGINT) AS nb,
       |    CAST(sum(dxb) OVER w AS BIGINT) AS xb
       |  FROM cells
       |  WINDOW w AS (ORDER BY look
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |tot AS (SELECT max(na + nb) AS total_n FROM cum),
       |looks AS (
       |  SELECT look, na, xa, nb, xb,
       |    round($TSql, 4) + 0.0 AS t_frac,
       |    $ZSql AS z0,
       |    ${boundSql(ObfC)} AS bound0
       |  FROM cum CROSS JOIN tot),
       |lk AS (SELECT *, abs(z0) > bound0 AS crossed FROM looks),
       |fc AS (SELECT min(CASE WHEN crossed THEN look END) AS dlook FROM lk)
       |SELECT look, na, xa, nb, xb, t_frac,
       |  round(z0, 4) + 0.0 AS z, round(bound0, 4) + 0.0 AS bound, crossed,
       |  CASE WHEN dlook IS NOT NULL AND look = dlook THEN true
       |    ELSE false END AS is_decision
       |FROM lk CROSS JOIN fc
       |ORDER BY look""".stripMargin
  }
}
