package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ------------------------------------------------------ Gini concentration

  /** q108: Gini coefficient per group — G = ΣᵢΣⱼ|xᵢ−xⱼ| / (2nΣx), the
    * concentration number behind "the top keys own the table"
    * questions ([[keySkew]] reports the max key; Gini reports the
    * whole curve's inequality in one scalar ∈ [0, 1)).
    *
    * Exactness: the pairwise-difference sum collapses over VALUE-LEVEL
    * cells — for cells sorted by value, T = Σ_v cnt_v·(x_v·C_v − S_v)
    * with C_v/S_v the strictly-below cumulative count/value-sum — so
    * every term is an exact integer (cents, decimal-first products),
    * G is ONE shared-text division of exact recovered doubles. Ordered
    * pairs = 2T, so G = T/(n·Σx).
    *
    * Rows with value ≤ 0 are excluded (Gini is defined on positive
    * quantities; a negative balance would make Σx a near-zero
    * denominator with G unbounded). Single-value groups → G = 0;
    * empty → no row.
    *
    * Plan: one scan → cell aggregate (bounded by the value RANGE in
    * cents — e.g. ~1.1M cells for a ±10k money column — never by row
    * count, checkpointed) → BANDED strictly-below cumulative pair
    * (BandedCumsum inclusive sums minus the current cell; per-task
    * cap even at range saturation) → final aggregate. CellGuard-ed:
    * a continuous value column (cells ≈ rows) fails loudly. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
      maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    // r10: the strictly-below cumulative pair is a BandedCumsum —
    // inclusive banded running sums minus the current cell, replacing
    // the per-group window (range-bounded but serial at saturation);
    // the CellGuard rides the dimension-grade guard aggregate
    val cells = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(groupCol).as("g"),
        expr(s"CAST(floor($valueCol * 1e2) AS BIGINT)").as("xc"))
      .groupBy("g", "xc").agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .withColumn("pxc", expr("CAST(CAST(cnt AS DECIMAL(38,0)) * xc" +
        " AS DECIMAL(38,0))"))
      .localCheckpoint(true) // guard totals + the banded cumulative
    val guard = cells.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_cells"))
      .filter(expr(CellGuard.sqlGuard("giniByGroup", "n_cells", maxCells)))
    BandedCumsum
      .cumsum(cells, Seq("g"), "xc", Seq("cnt", "pxc"),
        inputCheckpointed = true)
      .join(broadcast(guard), "g")
      .withColumn("cumcnt", expr("cum_cnt - cnt"))
      .withColumn("cumsum", expr("CAST(cum_pxc - pxc AS DECIMAL(38,0))"))
      .withColumn("t", expr(
        "CAST(cnt AS DECIMAL(38,0)) * (CAST(xc AS DECIMAL(38,0)) * cumcnt - cumsum)"))
      .groupBy("g")
      .agg(
        expr("CAST(sum(cnt) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(CAST(cnt AS DECIMAL(38,0)) * xc) AS DECIMAL(38,0))").as("sx"),
        expr("CAST(sum(t) AS DECIMAL(38,0))").as("tt"))
      .selectExpr(s"g AS $groupCol", "n_rows",
        "round(CAST(sx AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e2, 4)" +
          " + 0.0 AS mean_v",
        "round(CAST(tt AS DOUBLE)" +
          " / nullif(CAST(n_rows AS DOUBLE) * CAST(sx AS DOUBLE), 0e0), 6)" +
          " + 0.0 AS gini")
  }

  /** q108: how concentrated are positive customer balances within each
    * market segment? */
  def customerGini(spark: SparkSession, dir: String): DataFrame =
    giniByGroup(Tables.customer(spark, dir), "c_mktsegment", "c_acctbal")

  val customerGiniSql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(floor(c_acctbal * 1e2) AS BIGINT) AS xc,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM customer
      |  WHERE c_acctbal IS NOT NULL AND c_acctbal > 0
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, xc, cnt,
      |    coalesce(sum(cnt) OVER w, 0) AS cumcnt,
      |    coalesce(sum(CAST(cnt AS HUGEINT) * xc) OVER w, 0) AS cumsum
      |  FROM cells WINDOW w AS (PARTITION BY g ORDER BY xc
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |agg AS (
      |  SELECT g,
      |    CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(sum(CAST(cnt AS HUGEINT) * xc) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(cnt AS HUGEINT) * (CAST(xc AS HUGEINT) * cumcnt - cumsum))
      |         AS DECIMAL(38,0)) AS tt
      |  FROM cum GROUP BY 1)
      |SELECT g AS c_mktsegment, n_rows,
      |  round(CAST(sx AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e2, 4)
      |  + 0.0 AS mean_v,
      |  round(CAST(tt AS DOUBLE)
      |    / nullif(CAST(n_rows AS DOUBLE) * CAST(sx AS DOUBLE), 0e0), 6)
      |  + 0.0 AS gini
      |FROM agg""".stripMargin

  // ----------------------------------------------------------- Benford audit

  /** Benford expected first-digit shares log₁₀(1 + 1/d), as 6-decimal
    * LITERALS (they sum to exactly 1.000000): no runtime
    * transcendental, so the only doubles in the chain are exact-
    * integer ratios and these shared constants. */
  val BenfordShares: Seq[(Int, String)] = Seq(
    1 -> "3.01030e-1", 2 -> "1.76091e-1", 3 -> "1.24939e-1",
    4 -> "9.6910e-2", 5 -> "7.9181e-2", 6 -> "6.6947e-2",
    7 -> "5.7992e-2", 8 -> "5.1153e-2", 9 -> "4.5757e-2")

  /** q107: Benford's-law first-digit audit of a positive measure — the
    * classic fabricated-numbers screen (organically-grown magnitudes
    * follow log₁₀(1+1/d); keyed-in or synthesized ones don't). Returns
    * one row per digit 1–9 (zero-count digits included via the literal
    * spine): (digit, n_obs, obs_share, benford_share, dev_abs).
    *
    * Exactness: the first significant digit is taken from the STRING
    * head of the positive integer cents — pure integer/string ops,
    * no log₁₀ at runtime (a power-of-10 boundary value would be a
    * last-ulp parity coin-flip); expected shares are shared literals;
    * obs_share divides exact BIGINTs in shared text. Rows with
    * value ≤ 0 are excluded (no first significant digit).
    *
    * Plan: one scan → 9-row digit aggregate, broadcast-joined to the
    * 9-row spine — scan-priced, dimension-grade everywhere after. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val obs = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(expr(s"CAST(floor($valueCol * 1e2) AS BIGINT)").as("xc"))
      .filter(col("xc") > 0)
      .withColumn("digit", expr("CAST(substring(CAST(xc AS STRING), 1, 1) AS INT)"))
      .groupBy("digit").agg(expr("CAST(count(1) AS BIGINT)").as("n_obs"))
      // ≤9 rows, reused by the total AND the spine join: checkpoint so
      // the fact digit-scan runs once (no CSE across repeated frames)
      .localCheckpoint(true)
    val spine = spark.range(1, 10)
      .selectExpr("CAST(id AS INT) AS digit",
        s"CASE CAST(id AS INT) ${BenfordShares.map { case (d, s) =>
          s"WHEN $d THEN $s" }.mkString(" ")} END AS benford_share")
    val tot = obs.agg(expr("CAST(sum(n_obs) AS BIGINT)").as("n"))
    spine.join(obs, Seq("digit"), "left").crossJoin(broadcast(tot))
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .selectExpr("digit", "n_obs", "benford_share",
        "CAST(n_obs AS DOUBLE) / nullif(CAST(n AS DOUBLE), 0e0) AS share_raw")
      .selectExpr("digit", "n_obs",
        "round(share_raw, 6) + 0.0 AS obs_share",
        "benford_share",
        "round(abs(share_raw - benford_share), 6) + 0.0 AS dev_abs")
  }

  /** q107: do order totals look organically generated? */
  def ordersBenford(spark: SparkSession, dir: String): DataFrame =
    benfordAudit(Tables.orders(spark, dir), "o_totalprice")

  val ordersBenfordSql: String = {
    val values = BenfordShares.map { case (d, s) => s"($d, $s)" }.mkString(", ")
    s"""WITH obs AS (
       |  SELECT CAST(substring(CAST(xc AS VARCHAR), 1, 1) AS INT) AS digit,
       |    CAST(count(*) AS BIGINT) AS n_obs
       |  FROM (SELECT CAST(floor(o_totalprice * 1e2) AS BIGINT) AS xc
       |        FROM orders
       |        WHERE o_totalprice IS NOT NULL AND o_totalprice > 0)
       |  WHERE xc > 0 GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
       |spine(digit, benford_share) AS (VALUES $values),
       |joined AS (
       |  SELECT spine.digit, coalesce(obs.n_obs, 0) AS n_obs,
       |    spine.benford_share,
       |    CAST(coalesce(obs.n_obs, 0) AS DOUBLE)
       |      / nullif(CAST(tot.n AS DOUBLE), 0e0) AS share_raw
       |  FROM spine LEFT JOIN obs ON spine.digit = obs.digit CROSS JOIN tot)
       |SELECT digit, n_obs,
       |  round(share_raw, 6) + 0.0 AS obs_share,
       |  benford_share,
       |  round(abs(share_raw - benford_share), 6) + 0.0 AS dev_abs
       |FROM joined""".stripMargin
  }

  // ------------------------------------------------ Herfindahl concentration

  /** q112: Herfindahl–Hirschman concentration per group — HHI = Σ sᵢ²
    * over member shares sᵢ = cᵢ/Σc, the antitrust-grade concentration
    * scalar beside [[giniByGroup]]'s inequality curve and
    * [[keySkew]]'s max-key share. Also reports the "equivalent number
    * of equal members" 1/HHI (an effective cardinality — n equal
    * members give exactly n) and the top member's share.
    *
    * Exactness: member totals cᵢ are exact integer cents (per-row
    * floor, BIGINT sum); Σcᵢ² and (Σc)² are decimal-first products;
    * HHI / equiv_n / top_share are each ONE shared-text division of
    * exactly-recovered doubles (equiv_n from the RAW integer ratio,
    * not the rounded HHI).
    *
    * Plan: two keyed aggregates — scan → (group, member) cells →
    * group rows. The cell frame is keyed by (group, member), so a
    * hot member spreads across groups and a hot group across members;
    * no window anywhere. */
  def hhiByGroup(df: DataFrame, groupCol: String, memberCol: String,
      valueCol: String): DataFrame = {
    df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0 &&
        col(memberCol).isNotNull)
      .select(col(groupCol).as("g"), col(memberCol).as("m"),
        expr(s"CAST(floor($valueCol * 1e2) AS BIGINT)").as("xc"))
      .groupBy("g", "m")
      .agg(expr("CAST(sum(xc) AS BIGINT)").as("c"))
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_members"),
        expr("CAST(sum(c) AS DECIMAL(38,0))").as("s"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))")
          .as("ssq"),
        expr("CAST(max(c) AS BIGINT)").as("cmax"))
      .selectExpr(s"g AS $groupCol", "n_members",
        "round(CAST(s AS DOUBLE) / 1e2, 2) + 0.0 AS total_v",
        "round(CAST(ssq AS DOUBLE)" +
          " / nullif(CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0e0), 6)" +
          " + 0.0 AS hhi",
        "round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)" +
          " / nullif(CAST(ssq AS DOUBLE), 0e0), 2) + 0.0 AS equiv_n",
        "round(CAST(cmax AS DOUBLE) / nullif(CAST(s AS DOUBLE), 0e0), 6)" +
          " + 0.0 AS top_share")
  }

  /** q112: how concentrated is lineitem revenue across suppliers
    * within each nation? */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame =
    hhiByGroup(
      Tables.lineitem(spark, dir)
        .join(broadcast(Tables.supplier(spark, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("s_nationkey") === col("n_nationkey")),
      "n_name", "s_suppkey", "l_extendedprice")

  val supplierHhiSql: String =
    """WITH cells AS (
      |  SELECT n_name AS g, s_suppkey AS m,
      |    CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
      |    AND s_suppkey IS NOT NULL
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n_members,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS s,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS DECIMAL(38,0)) AS ssq,
      |    CAST(max(c) AS BIGINT) AS cmax
      |  FROM cells GROUP BY 1)
      |SELECT g AS n_name, n_members,
      |  round(CAST(s AS DOUBLE) / 1e2, 2) + 0.0 AS total_v,
      |  round(CAST(ssq AS DOUBLE)
      |    / nullif(CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0e0), 6)
      |    + 0.0 AS hhi,
      |  round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |    / nullif(CAST(ssq AS DOUBLE), 0e0), 2) + 0.0 AS equiv_n,
      |  round(CAST(cmax AS DOUBLE) / nullif(CAST(s AS DOUBLE), 0e0), 6)
      |    + 0.0 AS top_share
      |FROM agg""".stripMargin

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
