package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Wasserstein-1 (earth-mover) distance — the drift metric that
  * reports in the VALUE'S OWN UNITS, completing the drift deck: q141
  * PSI needs binning and saturates, q99 KS reads only the worst single
  * gap, q103 JS is bounded and unitless; W₁ = ∫|F_A − F_B| dv is "how
  * many dollars would you have to move, on average, to turn
  * distribution A into B" — the number a data-mix report can act on.
  *
  * Exactness: on a value grid, W₁ = Σ_cells |F_A(v) − F_B(v)|·gap(v)
  * where |F_A − F_B| = |cumA·n_B − cumB·n_A| / (n_A·n_B) — the
  * numerator an exact BIGINT cross-multiplication (the q99 KS move),
  * the gap an exact integer, so the whole integral accumulates as ONE
  * exact DECIMAL(38,0) sum with a SINGLE final division (no per-cell
  * doubles at all — stronger than a snap).
  *
  * Plan/scale: one scan → (grid value, group) cells; the dense
  * spine×groups grid is bounded by VALUE RANGE × k (the q48/q141
  * class — `gridDiv` is the 100 TB coarsening knob), cumulative
  * windows partitioned per group over the spine, one keyed aggregate
  * to finish. */
object Wasserstein {

  /** One-vs-rest W₁ per group from a frame with (g, v): group key and
    * exact BIGINT grid value. `unit` scales grid units back to the
    * value's natural units at display. Returns one row per group:
    * (g, n_seg, n_rest, w1). */
  def wassersteinOneVsRest(values: DataFrame, unit: Double): DataFrame = {
    val cells = values.groupBy("g", "v")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // feeds spine, groups, and the dense grid
    val spine = cells.groupBy("v")
      .agg(expr("CAST(sum(cnt) AS BIGINT)").as("cnt_all"))
    val groups = cells.select("g").distinct()
    val wCum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy("g").orderBy("v")
    val wAll = Window.partitionBy("g")
    spine.crossJoin(broadcast(groups))
      .join(cells, Seq("g", "v"), "left")
      .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
      .withColumn("cum_g", sum("cnt0").over(wCum))
      .withColumn("cum_all", sum("cnt_all").over(wCum))
      .withColumn("n_g", sum("cnt0").over(wAll))
      .withColumn("n_all", sum("cnt_all").over(wAll))
      .withColumn("gap", lead(col("v"), 1).over(wLead) - col("v"))
      .filter(col("gap").isNotNull)
      .groupBy("g")
      .agg(
        expr("CAST(max(n_g) AS BIGINT)").as("n_seg"),
        expr("CAST(max(n_all - n_g) AS BIGINT)").as("n_rest"),
        expr("CAST(sum(CAST(abs(cum_g * (n_all - n_g)" +
          " - (cum_all - cum_g) * n_g) AS DECIMAL(38,0)) * gap)" +
          " AS DECIMAL(38,0))").as("area"))
      .selectExpr("g", "n_seg", "n_rest",
        s"round($W1Sql * CAST($unit AS DOUBLE), 6) + 0.0 AS w1")
  }

  /** Shared-text single division — NULL when either side is empty. */
  private val W1Sql =
    "(CAST(area AS DOUBLE)" +
      " / nullif(CAST(n_seg AS DOUBLE) * CAST(n_rest AS DOUBLE), 0.0))"

  /** q181: how far (in dollars) does each segment's order-value
    * distribution sit from the rest of the market? Hundred-dollar
    * grid (q175 convention). */
  def segmentPriceShift(spark: SparkSession, dir: String): DataFrame =
    wassersteinOneVsRest(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g",
        "CAST(floor(o_totalprice / 100.0) AS BIGINT) AS v"), 100.0)
      .withColumnRenamed("g", "c_mktsegment")

  /** DuckDB twin: identical cells, dense grid, integral, division. */
  val segmentPriceShiftSql: String =
    s"""WITH base AS (
       |  SELECT c_mktsegment AS g,
       |    CAST(floor(o_totalprice / 100.0) AS BIGINT) AS v
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL),
       |cells AS (
       |  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2),
       |spine AS (
       |  SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM cells GROUP BY 1),
       |grps AS (SELECT DISTINCT g FROM cells),
       |dense AS (
       |  SELECT grps.g, spine.v, spine.cnt_all,
       |    coalesce(cells.cnt, 0) AS cnt0
       |  FROM spine CROSS JOIN grps
       |  LEFT JOIN cells ON cells.g = grps.g AND cells.v = spine.v),
       |walked AS (
       |  SELECT g, v, cnt_all,
       |    sum(cnt0) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g,
       |    sum(cnt_all) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all,
       |    sum(cnt0) OVER (PARTITION BY g) AS n_g,
       |    sum(cnt_all) OVER (PARTITION BY g) AS n_all,
       |    lead(v, 1) OVER (PARTITION BY g ORDER BY v) - v AS gap
       |  FROM dense),
       |agg AS (
       |  SELECT g, CAST(max(n_g) AS BIGINT) AS n_seg,
       |    CAST(max(n_all - n_g) AS BIGINT) AS n_rest,
       |    CAST(sum(CAST(abs(cum_g * (n_all - n_g)
       |      - (cum_all - cum_g) * n_g) AS HUGEINT) * gap) AS HUGEINT) AS area
       |  FROM walked WHERE gap IS NOT NULL GROUP BY 1)
       |SELECT g AS c_mktsegment, n_seg, n_rest,
       |  round($W1Sql * CAST(100.0 AS DOUBLE), 6) + 0.0 AS w1
       |FROM agg""".stripMargin
}
