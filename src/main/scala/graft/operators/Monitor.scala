package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-ops monitoring operators — the checks a warehouse runs BETWEEN
  * loads: profile drift between snapshot versions (the alert before a
  * broken upstream silently poisons a table), k-anonymity audits
  * before a dataset leaves the privacy boundary, and key-skew
  * profiling before choosing a join strategy. All exact-integer /
  * fixed-point, single-scan-per-snapshot shapes.
  */
object Monitor {

  // ---- q86: profile drift ----

  /** Null-rate drift threshold in ppm (1%) for the `flagged` bit. */
  val DriftPpm = 10000L

  /** Per-column profile of `df` over `cols`: one scan, one aggregate
    * row stacked long (the q31 shape). */
  private def profileOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_$c"),
        count_distinct(col(c)).as(s"d_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, " +
        cols.map(c => s"'$c', n_$c, d_$c").mkString(", ") +
        ") AS (column_name, n_nulls, n_distinct)"), col("n_rows"))
  }

  /** Compare two snapshots' per-column profiles — null-rate delta
    * (exact ppm), distinct-count ratio (ppm), and a drift flag when
    * the null rate moved more than [[DriftPpm]].
    * @return (column_name, null_ppm_old, null_ppm_new, distinct_old,
    *         distinct_new, flagged).
    * @note `cols` must exist in BOTH snapshots (the caller names the
    *       columns to watch); a column added or removed between
    *       versions is a SCHEMA change — catch it by diffing
    *       `df.columns` before profiling, not here. */
  def profileDrift(oldSnap: DataFrame, newSnap: DataFrame,
      cols: Seq[String]): DataFrame = {
    val o = profileOf(oldSnap, cols)
      .select(col("column_name"),
        expr("n_nulls * 1000000 div n_rows").as("null_ppm_old"),
        col("n_distinct").as("distinct_old"))
    val n = profileOf(newSnap, cols)
      .select(col("column_name").as("_cn"),
        expr("n_nulls * 1000000 div n_rows").as("null_ppm_new"),
        col("n_distinct").as("distinct_new"))
    o.join(n, col("column_name") === col("_cn"))
      .select(col("column_name"), col("null_ppm_old"), col("null_ppm_new"),
        col("distinct_old"), col("distinct_new"),
        (abs(col("null_ppm_new") - col("null_ppm_old")) > DriftPpm)
          .cast("int").as("flagged"))
  }

  /** q86: drift between the customer snapshot and a deterministically
    * degraded "today" (the q73 technique): segment nulled for every
    * 5th key, balance nulled for every 50th — the exact broken-upstream
    * shape drift monitoring exists to catch. */
  def customerDrift(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_mktsegment", "c_acctbal")
    val old = Tables.customer(spark, dir)
    val neu = old.selectExpr("c_custkey",
      "CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment",
      "CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal")
    profileDrift(old.select(("c_custkey" +: cols).map(col): _*), neu, cols)
  }

  val customerDriftSql: String =
    s"""WITH neu AS (
       |  SELECT c_custkey,
       |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
       |    CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal
       |  FROM customer),
       |po AS (
       |  SELECT count(*) AS n_rows,
       |    CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seg,
       |    count(DISTINCT c_mktsegment) AS d_seg,
       |    CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bal,
       |    count(DISTINCT c_acctbal) AS d_bal
       |  FROM customer),
       |pn AS (
       |  SELECT count(*) AS n_rows,
       |    CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seg,
       |    count(DISTINCT c_mktsegment) AS d_seg,
       |    CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bal,
       |    count(DISTINCT c_acctbal) AS d_bal
       |  FROM neu),
       |longf AS (
       |  SELECT 'c_mktsegment' AS column_name,
       |    po.n_seg * 1000000 // po.n_rows AS null_ppm_old,
       |    pn.n_seg * 1000000 // pn.n_rows AS null_ppm_new,
       |    po.d_seg AS distinct_old, pn.d_seg AS distinct_new
       |  FROM po CROSS JOIN pn
       |  UNION ALL
       |  SELECT 'c_acctbal',
       |    po.n_bal * 1000000 // po.n_rows, pn.n_bal * 1000000 // pn.n_rows,
       |    po.d_bal, pn.d_bal
       |  FROM po CROSS JOIN pn)
       |SELECT column_name, null_ppm_old, null_ppm_new,
       |  distinct_old, distinct_new,
       |  CAST(abs(null_ppm_new - null_ppm_old) > $DriftPpm AS INT) AS flagged
       |FROM longf""".stripMargin

  // ---- q87: k-anonymity audit ----

  /** Anonymity threshold for the registered audit. */
  val KAnon = 5L

  /** k-anonymity audit over quasi-identifier columns: every row whose
    * quasi-identifier combination is shared by fewer than k rows is
    * re-identifiable at that k. ONE map-side-combined group count +
    * one histogram-style rollup — never a row-level join back.
    * @return (group_size_band, n_groups, n_rows) where band is the
    *         equivalence-class size clamped at k. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long = KAnon): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("g"))
      .select(least(col("g"), lit(k)).as("group_size_band"), col("g"))
      .groupBy("group_size_band")
      .agg(count(lit(1)).as("n_groups"), sum(col("g")).as("n_rows"))

  /** q87: audit (c_nationkey, c_mktsegment) as quasi-identifiers on
    * the customer table — bands below [[KAnon]] are the risk report. */
  def customerKAnonymity(spark: SparkSession, dir: String): DataFrame =
    kAnonymity(Tables.customer(spark, dir), Seq("c_nationkey", "c_mktsegment"))

  val customerKAnonymitySql: String =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, count(*) AS g
       |  FROM customer GROUP BY 1, 2)
       |SELECT least(g, $KAnon) AS group_size_band,
       |  count(*) AS n_groups, CAST(sum(g) AS BIGINT) AS n_rows
       |FROM g GROUP BY 1""".stripMargin

  // ---- q88: join-key skew profile ----

  /** Key-skew profile for a prospective join/aggregation key: the
    * numbers that decide broadcast vs shuffle vs salting
    * ([[Skew.saltedJoin]]) BEFORE the job runs. ONE map-side-combined
    * key count, then one single-row total — top-share in exact ppm.
    * @return (n_rows, n_keys, max_key_rows, top_share_ppm,
    *         p_singleton_ppm). */
  def keySkew(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_key_rows"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_singletons"))
      .selectExpr("n_rows", "n_keys", "max_key_rows",
        "max_key_rows * 1000000 div n_rows AS top_share_ppm",
        "n_singletons * 1000000 div n_keys AS p_singleton_ppm")
  }

  /** q88: skew profile of the lineitem order key — the fact-side join
    * key every q2-style analysis shuffles on. */
  def lineitemKeySkew(spark: SparkSession, dir: String): DataFrame =
    keySkew(Tables.lineitem(spark, dir), "l_orderkey")

  val lineitemKeySkewSql: String =
    """WITH c AS (
      |  SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |    CAST(max(c) AS BIGINT) AS max_key_rows,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons
      |  FROM c)
      |SELECT n_rows, n_keys, max_key_rows,
      |  max_key_rows * 1000000 // n_rows AS top_share_ppm,
      |  n_singletons * 1000000 // n_keys AS p_singleton_ppm
      |FROM t""".stripMargin
}
