package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Weighted quantiles per group — the survey-statistics estimator
  * q16's unweighted percentiles can't give: each observation carries
  * a weight (units shipped, survey design weight, token count) and
  * the p-quantile is the smallest value whose CUMULATIVE WEIGHT
  * reaches p of the total. The weighted median (p50) is the
  * "price level at which half the units ship" number.
  *
  * Convention: lower weighted quantile — min{v : Σ_{v'≤v} w ≥ p·W}
  * — decided by exact integer cross-multiplication (100·cum ≥ pct·W),
  * never a rounded share. Nonpositive weights are excluded (a zero
  * weight can't move a quantile; a negative one makes cumulative
  * weight non-monotone — both documented out).
  *
  * Plan/scale: observations collapse to (group, value) CELLS first —
  * the q47 quantize-first discipline bounds cells by the value RANGE,
  * not the row count — then a BANDED cumulative weight over the
  * checkpointed cells (BandedCumsum: per-task cap even at range
  * saturation), a broadcast group-total join (carrying the
  * CellGuard), and one min-CASE aggregate per quantile. Weighted
  * mean ships from the same exact sums with ONE shared-text
  * division. */
object WeightedQuantile {

  /** Per-group weighted quantiles of `valCol` (exact integer,
    * pre-quantized) weighted by `wCol` (exact integer, > 0 kept).
    * Returns (group, w_total, p{..} per requested pct, wmean). */
  def weightedQuantiles(obs: DataFrame, groupCol: String, valCol: String,
      wCol: String, pcts: Seq[Int],
      maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100))
    // r10: the per-group cumulative-weight window is a BandedCumsum
    // (per-task cap independent of value-range saturation); totals +
    // the CellGuard ride one dimension-grade aggregate broadcast back
    val cells = obs
      .selectExpr(s"$groupCol AS g", s"$valCol AS v", s"$wCol AS w")
      .filter("v IS NOT NULL AND w > 0")
      .groupBy("g", "v")
      .agg(expr("CAST(sum(CAST(w AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .as("sw"),
        expr("CAST(sum(CAST(v AS DECIMAL(38,0)) * w) AS DECIMAL(38,0))")
          .as("svw"))
      .localCheckpoint(true) // totals + the banded cumulative share it
    val tot = cells.groupBy("g")
      .agg(expr("CAST(sum(sw) AS DECIMAL(38,0))").as("wt"),
        expr("CAST(sum(svw) AS DECIMAL(38,0))").as("svt"),
        expr("CAST(count(1) AS BIGINT)").as("n_cells"))
      .filter(expr(CellGuard.sqlGuard("weightedQuantiles", "n_cells", maxCells)))
    val quantAggs = pcts.map(p =>
      expr(s"CAST(min(CASE WHEN 100 * cum_sw >= $p * wt THEN v END)" +
        s" AS BIGINT)").as(s"p$p"))
    val aggs = quantAggs :+
      expr("CAST(max(wt) AS DECIMAL(38,0))").as("wt_out") :+
      expr("CAST(max(svt) AS DECIMAL(38,0))").as("svt_out")
    BandedCumsum
      // band width matched to DOLLAR-scale quantization (~10⁵ value
      // range): 4096-wide bands engage ~25-way parallelism where the
      // cent-scale default would leave ~2 bands (exactness is
      // bandWidth-invariant — BandedCumsumSpec)
      .cumsum(cells, Seq("g"), "v", Seq("sw"), bandWidth = 4096L,
        inputCheckpointed = true)
      .join(broadcast(tot), "g")
      .groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(Seq("g", "CAST(wt_out AS BIGINT) AS w_total") ++
        pcts.map(p => s"p$p") :+
        ("round(CAST(svt_out AS DOUBLE) / CAST(wt_out AS DOUBLE), 4)" +
          " + 0.0 AS wmean"): _*)
  }

  val Pcts = Seq(25, 50, 75, 90)

  /** q120: per return-flag, the whole-dollar price quantiles weighted
    * by units shipped — at what price level does the p-th unit go
    * out? */
  def lineitemWeightedQuantiles(spark: SparkSession, dir: String): DataFrame =
    weightedQuantiles(
      Tables.lineitem(spark, dir)
        .filter(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull
          && col("l_returnflag").isNotNull)
        .selectExpr("l_returnflag",
          "CAST(floor(l_extendedprice) AS BIGINT) AS price_d",
          "CAST(floor(l_quantity) AS BIGINT) AS qty"),
      "l_returnflag", "price_d", "qty", Pcts)
      .withColumnRenamed("g", "l_returnflag")

  val lineitemWeightedQuantilesSql: String =
    """WITH obs AS (
      |  SELECT l_returnflag AS g,
      |    CAST(floor(l_extendedprice) AS BIGINT) AS v,
      |    CAST(floor(l_quantity) AS BIGINT) AS w
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      |    AND l_returnflag IS NOT NULL),
      |cells AS (
      |  SELECT g, v,
      |    CAST(sum(CAST(w AS HUGEINT)) AS DECIMAL(38,0)) AS sw,
      |    CAST(sum(CAST(v AS HUGEINT) * w) AS DECIMAL(38,0)) AS svw
      |  FROM obs WHERE w > 0 GROUP BY 1, 2),
      |tot AS (
      |  SELECT g, CAST(sum(sw) AS DECIMAL(38,0)) AS wt,
      |    CAST(sum(svw) AS DECIMAL(38,0)) AS svt
      |  FROM cells GROUP BY 1),
      |cum AS (
      |  SELECT g, v, sum(sw) OVER (PARTITION BY g ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM cells)
      |SELECT cum.g AS l_returnflag,
      |  CAST(max(wt) AS BIGINT) AS w_total,
      |  CAST(min(CASE WHEN 100 * cum >= 25 * wt THEN v END) AS BIGINT) AS p25,
      |  CAST(min(CASE WHEN 100 * cum >= 50 * wt THEN v END) AS BIGINT) AS p50,
      |  CAST(min(CASE WHEN 100 * cum >= 75 * wt THEN v END) AS BIGINT) AS p75,
      |  CAST(min(CASE WHEN 100 * cum >= 90 * wt THEN v END) AS BIGINT) AS p90,
      |  round(CAST(max(svt) AS DOUBLE) / CAST(max(wt) AS DOUBLE), 4)
      |    + 0.0 AS wmean
      |FROM cum JOIN tot ON cum.g = tot.g
      |GROUP BY 1""".stripMargin
}
