package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Temperature-scaled mixture weights — the third member of the
  * training-mix family: q60's DoReMi applies FIXED target weights,
  * q64 rebalances to uniform; temperature sampling is the standard
  * middle ground (multilingual/multi-source pretraining's
  * p_g ∝ c_g^(1/T)) — T = 1 keeps the natural mix, T → ∞ approaches
  * uniform, and the reported per-domain sampling RATE (how much each
  * domain must be up/down-sampled to realize the mix) is the number
  * the sampler actually consumes:
  *
  *   share_temp(g) = c_g^(1/T) / Σ_h c_h^(1/T)
  *   rate(g) = share_temp(g) / share_natural(g)
  *
  * Exactness: counts are exact BIGINTs; c^(1/T) = exp(ln(c)/T) with
  * ln snapped to the 1e-9 nano grid and exp snapped 1e-9 (the
  * q94/q187 transcendental convention), each weight then floored to
  * an integer 1e-6 micro unit so the normalizing sum is order-free;
  * shares/rates are shared-text rationals on those exact integers.
  *
  * Plan/scale: ONE corpus-touch keyed count → a dimension-grade
  * weight projection → a broadcast total. No windows, no second
  * corpus pass. */
object TemperatureMix {

  /** Registered temperature (the mT5/XLM-R-style T ≈ 2 band). */
  val T = "2.0"

  // c^(1/T) in snapped micro units: exp(⌊ln c⌉ / T) snapped, floored
  private val WSql =
    s"CAST(floor(CAST(floor(exp(" +
      s"(CAST(floor(ln(CAST(n_docs AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)" +
      s" / 1e9) / $T) * 1e9 + 5e-1) AS BIGINT) / 1e9 * 1e6) AS BIGINT)"

  /** Temperature mix from (g): one row per domain with counts,
    * natural/temperature shares, and the realized sampling rate. */
  def temperatureMix(rows: DataFrame): DataFrame = {
    val counts = rows.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_docs"))
      .withColumn("w_i", expr(WSql))
      .localCheckpoint(true) // totals + the share projection read it
    counts
      .crossJoin(broadcast(counts.agg(
        expr("CAST(sum(n_docs) AS BIGINT)").as("n_total"),
        expr("CAST(sum(w_i) AS BIGINT)").as("w_total"))))
      .selectExpr("g", "n_docs",
        "round(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 6) + 0.0" +
          " AS share_natural",
        "round(CAST(w_i AS DOUBLE) / CAST(w_total AS DOUBLE), 6) + 0.0" +
          " AS share_temp",
        "round((CAST(w_i AS DOUBLE) / CAST(w_total AS DOUBLE))" +
          " / (CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)" +
          " + 0.0 AS rate")
  }

  /** q233: the T = 2 temperature mix over corpus sources — what
    * DoReMi-style fixed weights (q60) look like when derived from the
    * standard count-tempering rule instead; rate > 1 marks the
    * domains the sampler must upsample. */
  def sourceTemperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(Tables.documents(spark, dir)
      .filter(col("source").isNotNull)
      .select(col("source").as("g")))
      .withColumnRenamed("g", "source")

  /** DuckDB twin: identical snapped weight chain. */
  val sourceTemperatureMixSql: String =
    s"""WITH counts AS (
       |  SELECT source AS g, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
       |weighted AS (
       |  SELECT g, n_docs, $WSql AS w_i FROM counts),
       |tot AS (
       |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
       |    CAST(sum(w_i) AS BIGINT) AS w_total
       |  FROM weighted)
       |SELECT g AS source, n_docs,
       |  round(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 6) + 0.0
       |    AS share_natural,
       |  round(CAST(w_i AS DOUBLE) / CAST(w_total AS DOUBLE), 6) + 0.0
       |    AS share_temp,
       |  round((CAST(w_i AS DOUBLE) / CAST(w_total AS DOUBLE))
       |    / (CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
       |    + 0.0 AS rate
       |FROM weighted CROSS JOIN tot""".stripMargin
}
