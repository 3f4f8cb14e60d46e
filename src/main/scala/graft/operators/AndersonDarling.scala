package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-sample Anderson–Darling test (Scholz & Stephens 1987, the
  * midrank/ties A²ₐₖₙ version at k = 2) — the TAIL-sensitive member
  * of the two-sample deck: q99's KS sees only the worst single ECDF
  * gap (tail differences barely move a supremum), q103's JS
  * integrates mass displacement; AD integrates the SQUARED gap with
  * weight 1/(H(1−H)) — divergence in the tails is amplified, which is
  * exactly where corpus-shift and pricing-distribution regressions
  * hide. For k = 2 the two per-sample terms are algebraically equal
  * (M₁+M₂ = B), so the statistic collapses to one sum over distinct
  * value cells:
  *
  *   A² = (N−1)/(n₁·n₂·N) · Σ_cells l·D*² / (B*(2N−B*) − N·l)
  *   B* = 2·(pooled count before) + l      (twice the midrank cum)
  *   M* = 2·(x-count before) + lₓ          D* = N·M* − n₁·B*
  *
  * Exactness: B*, M*, D*, and the denominator are EXACT integers from
  * cumulative windows over value cells (doubled to clear the midrank
  * halves); each cell term is one shared-text double chain on
  * exactly-recovered operands (the q134 correctly-rounded-cast rule),
  * floored to integer nano-units and summed as DECIMAL(38,0) —
  * order-free (the q91/q103 micro-sum move). The full-span degenerate
  * cell (denominator 0, numerator provably 0) is guarded to 0 by
  * CASE. The final constant factor is one shared-text division.
  * Accept/reject lines live in the Scholz–Stephens table (standardized
  * A² vs ~1.96 at α=0.05) — the q210 convention: report the statistic,
  * document the line.
  *
  * Plan/scale: ONE map-side-combined aggregate to value cells, then
  * cumulative windows bounded by VALUE CARDINALITY (the q97/q99
  * class — never the corpus), then one keyed aggregate. */
object AndersonDarling {

  private val TermSql =
    "CASE WHEN bs * (2 * nn - bs) - nn * cnt > 0 THEN" +
      " CAST(floor(CAST(cnt AS DOUBLE) * CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE)" +
      " / CAST(bs * (2 * nn - bs) - nn * cnt AS DOUBLE) * 1e9)" +
      " AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END"
  private val A2Sql =
    "CASE WHEN n_x > 0 AND n_y > 0 AND n_x + n_y >= 2 THEN" +
      " round(CAST(n_x + n_y - 1 AS DOUBLE) * (CAST(ts AS DOUBLE) / 1e9)" +
      " / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)" +
      " * CAST(n_x + n_y AS DOUBLE)), 6) + 0.0 END"

  /** A² of `valueCol` between `clsX` and `clsY` rows per `groupCol`.
    * Returns (group, n_x, n_y, a2) — NULL when a side is empty. */
  def adTest(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame = {
    val cells = df
      .filter(col(classCol).isin(clsX, clsY) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(classCol).as("cls"),
        col(valueCol).as("v"))
      .groupBy("g", "v")
      .agg(
        expr(s"CAST(sum(CASE WHEN cls = '$clsX' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cx"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsY' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cy"))
      .withColumn("cnt", expr("cx + cy"))
    val before = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy("g")
    cells
      .withColumn("n1", sum("cx").over(all))
      .withColumn("nn", sum("cnt").over(all))
      .withColumn("bs",
        lit(2L) * coalesce(sum("cnt").over(before), lit(0L)) + col("cnt"))
      .withColumn("ms",
        lit(2L) * coalesce(sum("cx").over(before), lit(0L)) + col("cx"))
      .withColumn("dd", expr(
        "CAST(nn AS DECIMAL(38,0)) * ms - CAST(n1 AS DECIMAL(38,0)) * bs"))
      .groupBy("g")
      .agg(
        expr("CAST(max(n1) AS BIGINT)").as("n_x"),
        expr("CAST(max(nn - n1) AS BIGINT)").as("n_y"),
        expr(s"CAST(sum($TermSql) AS DECIMAL(38,0))").as("ts"))
      .selectExpr(s"g AS $groupCol", "n_x", "n_y", s"$A2Sql AS a2")
  }

  /** q215: returned vs accepted quantity distributions per ship year
    * — the q99/q103 frame under the tail-amplifying lens (a shift in
    * extreme order sizes that KS underweights is AD's headline). */
  def lineitemAd(spark: SparkSession, dir: String): DataFrame =
    adTest(
      Tables.lineitem(spark, dir)
        .withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_returnflag", "R", "A", "l_quantity")

  /** DuckDB twin: identical cells, doubled midrank integers, term
    * guard, and final chain. */
  val lineitemAdSql: String =
    s"""WITH cells AS (
       |  SELECT g, v,
       |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cy
       |  FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS g,
       |          l_returnflag AS cls, l_quantity AS v
       |        FROM lineitem
       |        WHERE l_returnflag IN ('R', 'A') AND l_quantity IS NOT NULL)
       |  GROUP BY g, v),
       |marked AS (
       |  SELECT g, cx, cy, cx + cy AS cnt,
       |    CAST(sum(cx) OVER (PARTITION BY g) AS BIGINT) AS n1,
       |    CAST(sum(cx + cy) OVER (PARTITION BY g) AS BIGINT) AS nn,
       |    2 * coalesce(CAST(sum(cx + cy) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + (cx + cy) AS bs,
       |    2 * coalesce(CAST(sum(cx) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + cx AS ms
       |  FROM cells),
       |terms AS (
       |  SELECT g, n1, nn, cnt, bs,
       |    CAST(nn AS HUGEINT) * ms - CAST(n1 AS HUGEINT) * bs AS dd
       |  FROM marked),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n1) AS BIGINT) AS n_x,
       |    CAST(max(nn - n1) AS BIGINT) AS n_y,
       |    CAST(sum($TermSql) AS HUGEINT) AS ts
       |  FROM terms GROUP BY g)
       |SELECT g AS ship_yr, n_x, n_y, $A2Sql AS a2
       |FROM agg""".stripMargin
}
