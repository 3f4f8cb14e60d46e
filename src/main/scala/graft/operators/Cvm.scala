package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-sample Cramér–von Mises statistic — the INTEGRATED-gap
  * companion of q99's KS: KS reads only the single largest ECDF gap
  * (one crossing can hide a broad, consistent shift); CvM integrates
  * the SQUARED gap over the whole pooled sample,
  *
  *   T = (n·m/N²) · Σ_{pooled z} (F₁(z) − F₂(z))²
  *
  * (Anderson 1962 convention: the sum runs over all N pooled
  * observations with multiplicity, F inclusive ECDFs), so it sees
  * distribution differences KS's supremum washes out — the standard
  * second opinion on any drift verdict.
  *
  * Exactness: FULLY integral until one final division — with A₁/A₂
  * the inclusive cumulative class counts at a value cell and c its
  * pooled multiplicity, (F₁−F₂)² = (m·A₁ − n·A₂)²/(nm)², so
  * S = Σ c·(m·A₁ − n·A₂)² is an exact DECIMAL(38,0) and
  * T = S/(N²·n·m) is ONE shared-text double. No snapping anywhere.
  *
  * Plan/scale: the q97/q99 sample-cell backbone — one corpus-touch
  * aggregate to (group, value) cells, a cumulative window over cells
  * (bounded by the VALUE GRID — the registered query's delay grid is
  * ≤ ~122 day cells), one keyed finish. */
object Cvm {

  /** Shared-text statistic from the integer aggregate. */
  private val TSql =
    "(CAST(s AS DOUBLE) / (CAST(n_x + n_y AS DOUBLE)" +
      " * CAST(n_x + n_y AS DOUBLE)" +
      " * CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))"

  /** CvM per group from a frame with (groupCol, classCol, valueCol):
    * one row per group — (groupCol, n_x, n_y, t_cvm); NULL when
    * either class is empty. */
  def cvmTest(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame = {
    val cells = df
      .filter(col(classCol).isin(clsX, clsY) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(classCol).as("cls"),
        col(valueCol).as("v"))
      .groupBy("g", "v")
      .agg(
        expr(s"CAST(sum(CASE WHEN cls = '$clsX' THEN 1 ELSE 0 END)" +
          " AS BIGINT)").as("cx"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsY' THEN 1 ELSE 0 END)" +
          " AS BIGINT)").as("cy"))
    val cum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("g")
    cells
      .withColumn("a1", sum("cx").over(cum))
      .withColumn("a2", sum("cy").over(cum))
      .withColumn("n", sum("cx").over(all))
      .withColumn("m", sum("cy").over(all))
      .groupBy("g")
      .agg(
        expr("CAST(max(n) AS BIGINT)").as("n_x"),
        expr("CAST(max(m) AS BIGINT)").as("n_y"),
        // the gap enters the wide type BEFORE multiplying: m·A1 is
        // n·m-scale and would overflow BIGINT long before 100 TB.
        // DECIMAL(38,0) then holds c·gap² through n·m < ~1e19 per
        // group (≈ 3e9 rows a side) — the q82 documented-bound stance
        expr("CAST(sum(CAST(cx + cy AS DECIMAL(38,0))" +
          " * (CAST(m AS DECIMAL(38,0)) * a1 - CAST(n AS DECIMAL(38,0)) * a2)" +
          " * (CAST(m AS DECIMAL(38,0)) * a1 - CAST(n AS DECIMAL(38,0)) * a2))" +
          " AS DECIMAL(38,0))")
          .as("s"))
      .filter(col("n_x") > 0 && col("n_y") > 0)
      .selectExpr(s"g AS $groupCol", "n_x", "n_y",
        s"round($TSql, 6) + 0.0 AS t_cvm")
  }

  /** q201: do RETURNED lines experience a different ship-latency
    * DISTRIBUTION (order→ship days) than accepted ones, per ship year
    * — q99 asks the same family of question of quantity with a
    * supremum; this reads the latency grid (a ≤ ~122-cell calendar
    * spread) with the integrated gap. The orders join is key-bounded
    * (≤ 7 lines per order — never a hot key). */
  def returnDelayCvm(spark: SparkSession, dir: String): DataFrame =
    cvmTest(
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_shipdate", "l_returnflag")
        .join(Tables.orders(spark, dir)
            .filter(col("o_orderdate").isNotNull)
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("ship_yr", expr("year(l_shipdate)"))
        .withColumn("delay", expr(
          "CAST(datediff(CAST(l_shipdate AS DATE)," +
            " CAST(o_orderdate AS DATE)) AS BIGINT)")),
      "ship_yr", "l_returnflag", "R", "A", "delay")

  /** DuckDB twin: identical cells, inclusive walks, integer S, one
    * shared-text division. */
  val returnDelayCvmSql: String =
    s"""WITH cells AS (
       |  SELECT g, v,
       |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cy
       |  FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS g,
       |          l_returnflag AS cls,
       |          CAST(date_diff('day', CAST(o_orderdate AS DATE),
       |            CAST(l_shipdate AS DATE)) AS BIGINT) AS v
       |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |        WHERE l_returnflag IN ('R', 'A')
       |          AND l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL)
       |  GROUP BY g, v),
       |cum AS (
       |  SELECT g, cx, cy,
       |    sum(cx) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a1,
       |    sum(cy) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a2,
       |    sum(cx) OVER (PARTITION BY g) AS n,
       |    sum(cy) OVER (PARTITION BY g) AS m
       |  FROM cells),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n) AS BIGINT) AS n_x,
       |    CAST(max(m) AS BIGINT) AS n_y,
       |    CAST(sum(CAST(cx + cy AS HUGEINT)
       |      * (CAST(m AS HUGEINT) * a1 - CAST(n AS HUGEINT) * a2)
       |      * (CAST(m AS HUGEINT) * a1 - CAST(n AS HUGEINT) * a2)) AS HUGEINT) AS s
       |  FROM cum GROUP BY g)
       |SELECT g AS ship_yr, n_x, n_y,
       |  round($TSql, 6) + 0.0 AS t_cvm
       |FROM agg
       |WHERE n_x > 0 AND n_y > 0""".stripMargin
}
