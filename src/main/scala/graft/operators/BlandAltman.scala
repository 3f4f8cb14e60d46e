package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bland–Altman agreement analysis — the METHOD-RECONCILIATION
  * operator the data-quality deck (q53 expectations, q73 snapshot
  * diff, q86 drift) was missing: when two pipelines measure the SAME
  * quantity (an order's header total vs the sum of its lines), a
  * correlation says nothing about agreement; Bland–Altman reports the
  * BIAS (mean difference), the LIMITS OF AGREEMENT (bias ± 1.96·SD of
  * differences — where 95% of discrepancies live if they're
  * well-behaved), and the share of pairs OUTSIDE those limits (the
  * actionable reconciliation queue).
  *
  * Exactness: differences are exact BIGINT cents; (n, Σd, Σd²) from
  * one aggregate; bias/SD/limits are shared-text chains on
  * exactly-recovered doubles (the q134 rule) with the q158 1.959963985
  * constant; the outside count is a SECOND pass comparing each exact
  * integer d against the broadcast double limits — a deterministic
  * comparison since both operands are bit-identical in both engines.
  * n < 2 or zero variance → NULL limits (outside count follows the
  * bias-only convention: 0).
  *
  * Plan/scale: one key-join of two keyed aggregates → the diff frame
  * CHECKPOINTED (the stats pass and the outside pass both read it) →
  * a 1-row broadcast back. No windows. */
object BlandAltman {

  private val SdSql =
    "sqrt((nd * sdd - sd * sd) / nullif(nd * (nd - 1.0), 0e0))"
  private val Z95 = "1.959963985"

  /** BA from a paired frame (k, a, b): pair key and the two exact
    * BIGINT measurements. One row: (n_pairs, bias, sd_diff, loa_low,
    * loa_high, n_outside, pct_outside). */
  def blandAltman(pairs: DataFrame): DataFrame = {
    val diffs = pairs.selectExpr("k", "CAST(a - b AS BIGINT) AS d")
      .localCheckpoint(true) // stats + outside passes both read it
    val stats = diffs
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_pairs"),
        expr("CAST(sum(d) AS DECIMAL(38,0))").as("sd_i"),
        expr("CAST(sum(CAST(d AS DECIMAL(38,0)) * d) AS DECIMAL(38,0))")
          .as("sdd_i"))
      .selectExpr("n_pairs", "CAST(n_pairs AS DOUBLE) AS nd",
        "CAST(sd_i AS DOUBLE) AS sd", "CAST(sdd_i AS DOUBLE) AS sdd")
      .selectExpr("n_pairs", "nd", "sd / nd AS bias",
        s"CASE WHEN n_pairs >= 2 THEN $SdSql END AS sdd_raw")
      .selectExpr("n_pairs", "nd", "bias",
        "CASE WHEN sdd_raw > 0e0 THEN sdd_raw END AS sd_diff")
      .selectExpr("n_pairs", "nd", "bias", "sd_diff",
        s"bias - $Z95 * sd_diff AS lo",
        s"bias + $Z95 * sd_diff AS hi")
    diffs.crossJoin(broadcast(stats))
      .groupBy("n_pairs", "nd", "bias", "sd_diff", "lo", "hi")
      .agg(expr("CAST(sum(CASE WHEN lo IS NOT NULL AND" +
        " (CAST(d AS DOUBLE) < lo OR CAST(d AS DOUBLE) > hi)" +
        " THEN 1 ELSE 0 END) AS BIGINT)").as("n_outside"))
      .selectExpr("n_pairs",
        "round(bias, 4) + 0.0 AS bias",
        "round(sd_diff, 4) + 0.0 AS sd_diff",
        "round(lo, 4) + 0.0 AS loa_low",
        "round(hi, 4) + 0.0 AS loa_high",
        "n_outside",
        "round(CAST(n_outside AS DOUBLE) / nd, 6) + 0.0 AS pct_outside")
  }

  /** q230: do the order header and its line items agree on revenue —
    * header o_totalprice vs Σ line extendedprice, in cents; the bias
    * is the systematic book difference (tax/discount live only in the
    * header), the outside share is the reconciliation queue. */
  def orderLineAgreement(spark: SparkSession, dir: String): DataFrame =
    blandAltman(
      Tables.orders(spark, dir)
        .filter(col("o_totalprice").isNotNull)
        .selectExpr("o_orderkey AS k",
          "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS a")
        .join(
          Tables.lineitem(spark, dir)
            .filter(col("l_extendedprice").isNotNull)
            .groupBy(col("l_orderkey").as("k"))
            .agg(expr("CAST(sum(CAST(floor(l_extendedprice * 1e2)" +
              " AS BIGINT)) AS BIGINT)").as("b")),
          "k"))

  /** DuckDB twin: identical cents, chains, and second pass. */
  val orderLineAgreementSql: String =
    s"""WITH hdr AS (
       |  SELECT o_orderkey AS k,
       |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS a
       |  FROM orders WHERE o_totalprice IS NOT NULL),
       |lines AS (
       |  SELECT l_orderkey AS k,
       |    CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)) AS BIGINT)
       |      AS b
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
       |diffs AS (
       |  SELECT CAST(a - b AS BIGINT) AS d FROM hdr JOIN lines USING (k)),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS sd_i,
       |    CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd_i
       |  FROM diffs),
       |rec AS (
       |  SELECT n_pairs, CAST(n_pairs AS DOUBLE) AS nd,
       |    CAST(sd_i AS DOUBLE) AS sd, CAST(sdd_i AS DOUBLE) AS sdd
       |  FROM agg),
       |st1 AS (
       |  SELECT n_pairs, nd, sd / nd AS bias,
       |    CASE WHEN n_pairs >= 2 THEN $SdSql END AS sdd_raw
       |  FROM rec),
       |st2 AS (
       |  SELECT n_pairs, nd, bias,
       |    CASE WHEN sdd_raw > 0e0 THEN sdd_raw END AS sd_diff
       |  FROM st1),
       |stats AS (
       |  SELECT n_pairs, nd, bias, sd_diff,
       |    bias - $Z95 * sd_diff AS lo,
       |    bias + $Z95 * sd_diff AS hi
       |  FROM st2),
       |outside AS (
       |  SELECT n_pairs, nd, bias, sd_diff, lo, hi,
       |    CAST(sum(CASE WHEN lo IS NOT NULL AND
       |      (CAST(d AS DOUBLE) < lo OR CAST(d AS DOUBLE) > hi)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
       |  FROM diffs CROSS JOIN stats
       |  GROUP BY 1, 2, 3, 4, 5, 6)
       |SELECT n_pairs,
       |  round(bias, 4) + 0.0 AS bias,
       |  round(sd_diff, 4) + 0.0 AS sd_diff,
       |  round(lo, 4) + 0.0 AS loa_low,
       |  round(hi, 4) + 0.0 AS loa_high,
       |  n_outside,
       |  round(CAST(n_outside AS DOUBLE) / nd, 6) + 0.0 AS pct_outside
       |FROM outside""".stripMargin
}
