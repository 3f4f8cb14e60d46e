package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Feature-engineering bin operators: quantile binning and fixed-width
  * histograms — the discretization steps a model-prep pipeline runs
  * over fact-scale columns.
  */
object Binning {

  val NtileBins = 4

  /** #52 (q47) Per-group quantile binning: ntile over each nation's
    * balance distribution with a total (value, key) order so ties are
    * deterministic. PARTITIONED ntile is the scale-correct shape — the
    * window sorts within each group's partition; a GLOBAL ntile would
    * funnel the corpus through one partition (for global quantile
    * binning at scale use [[quantileCutBins]] instead). */
  def ntileBin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        (round(col("c_acctbal"), 4) + 0.0).as("c_acctbal"),
        ntile(NtileBins).over(w).cast("long").as("bal_quartile"))
  }

  val ntileBinSql: String =
    s"""SELECT c_custkey, c_nationkey, round(c_acctbal, 4) + 0.0 AS c_acctbal,
       |  CAST(ntile($NtileBins) OVER (PARTITION BY c_nationkey
       |    ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bal_quartile
       |FROM customer""".stripMargin

  /** Scale path for global quantile binning: cut points from ONE
    * `approx_percentile` aggregate (bounded sketch, map-side merged),
    * then binning is a pure projection against the literal cuts — no
    * global sort, no single-partition window, two passes total.
    * Sketch results are engine-specific, so this is spec-verified
    * (monotonicity + approximate balance) rather than oracle-hashed,
    * like [[Relational.percentilesApprox]]. */
  def quantileCutBins(df: DataFrame, valueCol: String, nBins: Int,
      accuracy: Int = 10000): DataFrame = {
    val probs = (1 until nBins).map(_.toDouble / nBins)
    // approx_percentile over zero non-null rows returns SQL NULL —
    // an empty or all-null input must yield null bins, not a driver NPE
    val row = df.agg(approx_percentile(col(valueCol),
        typedLit(probs), lit(accuracy)).as("cuts"))
      .head
    val cuts: Seq[Double] =
      if (row.isNullAt(0)) Seq.empty else row.getSeq[Double](0)
    val bin = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(valueCol) > c, 1).otherwise(0)
    }
    // null values get a null bin (not silently bin 0)
    df.withColumn("bin",
      when(col(valueCol).isNotNull, bin.cast("long")))
  }

  val HistBins = 20
  val HistLo = 0.0
  val HistHi = 400.0

  /** #53 (q48) Fixed-width histogram over `events.value`: one
    * map-side-combined aggregate on the bin key — the cheapest possible
    * distribution profile of a fact column (bin id is a pure
    * projection; the shuffle carries `HistBins` rows per task). */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val width = (HistHi - HistLo) / HistBins
    val bin = least(floor((col("value") - HistLo) / width), lit(HistBins - 1))
      .cast("long")
    Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("value") >= HistLo && col("value") <= HistHi)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        (round(avg(col("value")), 4) + 0.0).as("avg_value"))
      .select(col("bin"), (lit(HistLo) + col("bin") * width).as("bin_lo"),
        col("n"), col("avg_value"))
  }

  val histogramSql: String = {
    val width = (HistHi - HistLo) / HistBins
    s"""SELECT bin, $HistLo + bin * $width AS bin_lo, count(*) AS n,
       |  round(avg(value), 4) + 0.0 AS avg_value
       |FROM (
       |  SELECT CAST(least(floor((value - $HistLo) / $width), ${HistBins - 1}) AS BIGINT) AS bin,
       |    value
       |  FROM events
       |  WHERE value IS NOT NULL AND value >= $HistLo AND value <= $HistHi)
       |GROUP BY bin""".stripMargin
  }
}
