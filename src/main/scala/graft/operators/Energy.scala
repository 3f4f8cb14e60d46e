package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Energy distance (Székely–Rizzo) — the L2 member that completes the
  * CDF-distance family: q99 KS reads sup|F_A − F_B|, q181 W₁ reads
  * ∫|F_A − F_B| dv, and the 1-D energy distance is
  *
  *   D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| = 2·∫ (F_A(v) − F_B(v))² dv
  *
  * (Székely 2003's identity) — quadratic weighting, so it rewards many
  * moderate CDF gaps where KS sees only the single worst one, and
  * unlike W₁ it powers the energy two-sample TEST: T =
  * (n_A·n_B/(n_A+n_B))·D², the statistic behind distance-based
  * drift detection with no binning choice at all.
  *
  * Exactness: the q181 dense-grid machinery verbatim, squared — per
  * grid cell the CDF gap is the exact integer cross-multiplication
  * (cumA·n_B − cumB·n_A), squared as DECIMAL(38,0) (past ~3e6 rows the
  * BIGINT square would overflow — the q68 stance applied up front),
  * times the exact integer gap, summed DECIMAL(38,0) — ONE final
  * division recovers D², so no per-cell doubles exist anywhere.
  *
  * Plan/scale: identical to q181 — one scan → value-level cells →
  * dense spine×groups grid (bounded by value range × k, grid division
  * is the 100 TB coarsening knob) → per-group cumulative windows over
  * the spine → one keyed aggregate. The corpus is touched once.
  */
object Energy {

  /** One-vs-rest energy distance per group from (g, v) with exact
    * BIGINT grid values. `unit` scales grid units back to natural
    * units. Returns (g, n_seg, n_rest, e_dist, t_energy). */
  def energyOneVsRest(values: DataFrame, unit: Double): DataFrame = {
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
        expr("CAST(sum(CAST(cum_g * (n_all - n_g)" +
          " - (cum_all - cum_g) * n_g AS DECIMAL(38,0))" +
          " * CAST(cum_g * (n_all - n_g)" +
          " - (cum_all - cum_g) * n_g AS DECIMAL(38,0)) * gap)" +
          " AS DECIMAL(38,0))").as("area_sq"))
      .selectExpr("g", "n_seg", "n_rest",
        s"round($D2Sql * CAST($unit AS DOUBLE), 6) + 0.0 AS e_dist")
      .selectExpr("g", "n_seg", "n_rest", "e_dist",
        s"round($TSql, 6) + 0.0 AS t_energy")
  }

  /** Shared-text D² = 2·area_sq / (n_A·n_B)² — NULL when a side is
    * empty. */
  private val D2Sql =
    "(2.0 * CAST(area_sq AS DOUBLE)" +
      " / nullif(CAST(n_seg AS DOUBLE) * CAST(n_rest AS DOUBLE)" +
      " * CAST(n_seg AS DOUBLE) * CAST(n_rest AS DOUBLE), 0.0))"

  /** Energy test statistic from the already-scaled e_dist. */
  private val TSql =
    "(CAST(n_seg AS DOUBLE) * CAST(n_rest AS DOUBLE)" +
      " / (CAST(n_seg AS DOUBLE) + CAST(n_rest AS DOUBLE)) * e_dist)"

  /** q279: energy distance of each order priority's price distribution
    * from the rest — beside q181's segment W₁: same machinery, L2
    * weighting, plus the test statistic a drift monitor thresholds.
    * Hundred-dollar grid (q175 convention). */
  def priorityPriceEnergy(spark: SparkSession, dir: String): DataFrame =
    energyOneVsRest(Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull && col("o_orderpriority").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "CAST(floor(o_totalprice / 100.0) AS BIGINT) AS v"), 100.0)
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cells, dense grid, squared integral. */
  val priorityPriceEnergySql: String =
    s"""WITH base AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(floor(o_totalprice / 100.0) AS BIGINT) AS v
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
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
       |    CAST(sum(CAST(cum_g * (n_all - n_g)
       |      - (cum_all - cum_g) * n_g AS HUGEINT)
       |      * CAST(cum_g * (n_all - n_g)
       |      - (cum_all - cum_g) * n_g AS HUGEINT) * gap) AS HUGEINT) AS area_sq
       |  FROM walked WHERE gap IS NOT NULL GROUP BY 1),
       |dist AS (
       |  SELECT g, n_seg, n_rest,
       |    round($D2Sql * CAST(100.0 AS DOUBLE), 6) + 0.0 AS e_dist
       |  FROM agg)
       |SELECT g AS o_orderpriority, n_seg, n_rest, e_dist,
       |  round($TSql, 6) + 0.0 AS t_energy
       |FROM dist""".stripMargin
}
