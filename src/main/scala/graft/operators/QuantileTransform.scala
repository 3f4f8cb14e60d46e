package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Quantile (CDF) transform — map a column onto its empirical
  * distribution function, the rank-based normalization ML feature prep
  * reaches for when z-scores (q8) break on heavy tails (sklearn's
  * QuantileTransformer). Ties map to their MIDRANK (the plateau
  * convention), so the transform is a deterministic pure function of
  * the value.
  *
  * Exactness: with counts per distinct value, `cdf_ppm(v) =
  * ((2·cumBefore(v) + n(v)) · 1e6) div (2·N)` — the q83/q68 integer
  * midrank chain, bit-equal floor division in the twin.
  *
  * Scale shape: ONE map-side-combined count by value, then a
  * cumulative window over the DISTINCT-VALUE frame. That window is
  * value-level — correct ONLY for cardinality-bounded columns
  * (integer codes, quantities, buckets; the q68 rank-map precondition).
  * A continuous column (prices) must be quantized first — e.g.
  * [[Binning.quantileCutBins]] cut points or fixed-point rounding —
  * or the "value level" IS the corpus and the window is the
  * single-partition wall this formulation exists to avoid. Applying
  * the transform to rows is a broadcast join of the emitted map.
  */
object QuantileTransform {

  /** CDF transform table for a cardinality-bounded column.
    *
    * Integrality is ENFORCED, not assumed: the value is cast to long
    * only behind a `floor(v) = v` guard — a non-integral value raises
    * at execution instead of silently truncating (Spark cast truncates
    * toward zero, DuckDB CAST rounds: an unguarded cast of a continuous
    * column would both diverge from the twin and collapse distinct
    * values). Pre-quantize continuous columns (e.g.
    * [[Binning.quantileCutBins]] or fixed-point rounding) before
    * calling.
    *
    * @return (value, n_rows, cdf_ppm) — one row per distinct value,
    *         cdf_ppm the midrank CDF in [0, 1e6]. */
  def cdfTable(df: DataFrame, column: String): DataFrame = {
    val c = col(column)
    val byValue = df.filter(c.isNotNull)
      .groupBy(
        when(c === floor(c), c.cast("long"))
          .otherwise(raise_error(concat(
            lit(s"QuantileTransform.cdfTable: non-integral value in '$column': "),
            c.cast("string"), lit(" — quantize the column first"))))
          .as("value"))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy(col("value")).rowsBetween(Window.unboundedPreceding, -1)
    byValue
      .withColumn("cb", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("n", sum(col("n_rows")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .selectExpr("value", "n_rows",
        "((2 * cb + n_rows) * 1000000) div (2 * n) AS cdf_ppm")
  }

  /** q93: the CDF table of lineitem quantity (integer-valued, ~50
    * distinct — genuinely value-level). */
  def quantityCdf(spark: SparkSession, dir: String): DataFrame =
    cdfTable(Tables.lineitem(spark, dir), "l_quantity")

  val quantityCdfSql: String =
    """WITH by_value AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS value, count(*) AS n_rows
      |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
      |ranked AS (
      |  SELECT value, n_rows,
      |    coalesce(CAST(sum(n_rows) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb,
      |    CAST(sum(n_rows) OVER () AS BIGINT) AS n
      |  FROM by_value)
      |SELECT value, n_rows,
      |  ((2 * cb + n_rows) * 1000000) // (2 * n) AS cdf_ppm
      |FROM ranked""".stripMargin
}
