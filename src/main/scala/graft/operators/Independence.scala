package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Chi-square independence test + Cramér's V — the categorical
  * counterpart of q68's correlation matrix: are two discrete columns
  * associated, and how strongly? The EDA/monitoring check behind
  * "did the segment mix shift by region" questions (and the drift
  * alarm [[Monitor.profileDrift]] can't see, because marginals alone
  * stay flat when the JOINT distribution moves).
  *
  * Exactness: with O = observed cell count, rT/cT = margins, n =
  * total, each cell's chi-square term (O − rT·cT/n)²/(rT·cT/n)
  * clears to the ratio d²/(n·rT·cT) with d = O·n − rT·cT, an exact
  * Long (|d| ≤ n² — exact through n < 3e9). The per-cell term is then
  * ONE shared-text double chain (d·d, three divisions, ·1e6, floor):
  * every step is a deterministic IEEE op on identical operands in
  * identical order, so the floored Long is bit-equal on both engines,
  * and the SUM of those Longs is order-free — the per-cell floor at
  * 1e-6 is the documented fixed-point definition of the statistic.
  * (d² stays an EXACT double while n² < 2^26.5 ≈ 9.5e7 rows; past
  * that the term still matches cross-engine — same rounding — but to
  * keep d² exact swap the chain to DECIMAL(38,0), the q68 technique.)
  * ZERO cells contribute too (O=0 ⇒ term = rT·cT/n): the cell
  * universe is the margin cross join, not the observed groupBy.
  * Cramér's V = sqrt(χ²/(n·min(r−1,c−1))) — sqrt of an
  * integer-derived double is correctly rounded IEEE on both engines,
  * so round-6 equality holds.
  *
  * Scale shape: ONE map-side-combined cell count over the fact, two
  * dimension-grade margin aggregates, and a margin×margin cross join
  * (r·c rows — dimension-grade by definition for categoricals) left-
  * joined with the observed cells. */
object Independence {

  /** Chi-square independence of two categorical columns.
    *
    * NULL convention: rows where EITHER column is NULL are excluded up
    * front (the [[Eval]] convention — a missing level is not a level).
    * Without the filter, NULL keys would form observed groups whose
    * counts enter the margins and n, but the equi left-join back
    * (NULL = NULL is false) would see their O as 0 — silently inflating
    * the statistic — and count_distinct would drop the NULL level from
    * dof. The SQL twin carries the same WHERE.
    *
    * @return one row: (n_rows, n_a, n_b, dof, chi2_micro, cramers_v). */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df
      .filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).as("av"), col(b).as("bv"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("av").agg(sum("o").as("rt"))
    val rb = cells.groupBy("bv").agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"), count(lit(1)).as("n_observed"))
    // margin cross join = the FULL cell universe (zero cells included)
    val universe = ra.crossJoin(rb).crossJoin(broadcast(n))
      .join(cells, Seq("av", "bv"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    universe
      .agg(
        max(col("n")).as("n_rows"),
        count_distinct(col("av")).as("n_a"),
        count_distinct(col("bv")).as("n_b"),
        sum(expr("CAST(floor(CAST(o * n - rt * ct AS DOUBLE)" +
          " * CAST(o * n - rt * ct AS DOUBLE)" +
          " / CAST(n AS DOUBLE) / CAST(rt AS DOUBLE) / CAST(ct AS DOUBLE)" +
          " * 1000000.0) AS BIGINT)")).as("chi2_micro"))
      .selectExpr("n_rows", "n_a", "n_b",
        "(n_a - 1) * (n_b - 1) AS dof", "chi2_micro",
        // nullif: V is undefined when either variable has one level
        // (dof 0) — NULL, not an ANSI divide-by-zero
        "round(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)" +
          " / nullif(CAST(n_rows AS DOUBLE) * CAST(least(n_a - 1, n_b - 1) AS DOUBLE), 0.0)), 6)" +
          " + 0.0 AS cramers_v")
  }

  // -------------------------------------------------- Mutual information

  /** 1e-9-grid ln snap (the q103 discipline): the ARGUMENT is a ratio
    * of exact integers recovered as doubles, the output is snapped so
    * engine-ln last-ulp differences cannot reach the micro-floor. */
  private def lnSnap(ratio: String): String =
    s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Entropy micro-sum over a margin frame (columns: cnt BIGINT,
    * n BIGINT): Σ cnt·ln(n/cnt) in integer nano-nats. */
  private val HTermSql: String =
    s"CAST(sum(CAST(floor(CAST(cnt AS DOUBLE) * (${lnSnap("CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)")}) * 1e9)" +
      " AS DECIMAL(38,0))) AS DECIMAL(38,0))"

  /** Mutual information I(A;B) with marginal entropies and the
    * sqrt-normalized NMI — the information-theoretic companion of
    * [[chiSquare]]: χ² asks IF two categoricals are associated, MI
    * says how many nats of one the other carries (the feature-
    * selection / leakage-audit number: NMI ≈ 1 between a feature and
    * a label means the "feature" IS the label).
    *
    * Exactness (q103's ln discipline): every ln argument is a ratio
    * of EXACT integers — per cell n·O vs rT·cT (decimal-first
    * products), per margin n vs rT — snapped to the 1e-9 grid; each
    * weighted term is floored to integer nano-nats and ONLY integers
    * are summed, so both engines enter the shared final chain with
    * bit-identical operands. Zero cells contribute 0 (the 0·ln 0
    * convention), so only OBSERVED cells are scanned — no margin
    * cross join needed, unlike χ². MI is clamped at 0 by CASE (NOT
    * greatest(), which ignores NULLs): micro-flooring can leave an
    * exactly-independent table a few nano-nats negative.
    *
    * Precondition: per-term |cnt·ln(·)·1e9| ≤ n/e·1e9 must fit a
    * signed 64-bit floor — holds through n ≈ 2.5e10 rows; past that,
    * scale the micro grid down (the statistic's documented
    * fixed-point resolution), as q91 notes for d².
    *
    * NULL convention: NULL in either column excludes the row (the
    * [[chiSquare]] rule); single-level margins → h = 0 and NMI NULL
    * via nullif.
    *
    * @return one row (n_rows, h_a, h_b, mi, nmi). */
  def mutualInfo(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df
      .filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).as("av"), col(b).as("bv"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // dimension-grade; reused by margins + MI
    val n = cells.agg(expr("CAST(sum(o) AS BIGINT)").as("n"))
    def hAgg(keyCol: String, out: String): DataFrame =
      cells.groupBy(col(keyCol)).agg(expr("CAST(sum(o) AS BIGINT)").as("cnt"))
        .crossJoin(broadcast(n))
        .agg(expr(HTermSql).as(out))
    val miTerm =
      s"CAST(floor(CAST(o AS DOUBLE) * (${lnSnap(
        "CAST(CAST(o AS DECIMAL(38,0)) * n AS DOUBLE)" +
          " / CAST(CAST(rt AS DECIMAL(38,0)) * ct AS DOUBLE)")}) * 1e9)" +
        " AS DECIMAL(38,0))"
    val ra = cells.groupBy("av").agg(expr("CAST(sum(o) AS BIGINT)").as("rt"))
    val rb = cells.groupBy("bv").agg(expr("CAST(sum(o) AS BIGINT)").as("ct"))
    val miAgg = cells
      .join(broadcast(ra), "av").join(broadcast(rb), "bv")
      .crossJoin(broadcast(n))
      .agg(expr("CAST(max(n) AS BIGINT)").as("n_rows"),
        expr(s"CAST(sum($miTerm) AS DECIMAL(38,0))").as("s_mi"))
    miAgg
      .crossJoin(hAgg("av", "s_ha")).crossJoin(hAgg("bv", "s_hb"))
      .selectExpr("n_rows",
        "CAST(s_ha AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e9 AS ha_raw",
        "CAST(s_hb AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e9 AS hb_raw",
        "CAST(s_mi AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e9 AS mi_signed")
      .selectExpr("n_rows", "ha_raw", "hb_raw",
        "CASE WHEN mi_signed < 0e0 THEN 0e0 ELSE mi_signed END AS mi_raw")
      .selectExpr("n_rows",
        "round(ha_raw, 6) + 0.0 AS h_a",
        "round(hb_raw, 6) + 0.0 AS h_b",
        "round(mi_raw, 6) + 0.0 AS mi",
        "round(mi_raw / nullif(sqrt(ha_raw * hb_raw), 0e0), 6) + 0.0 AS nmi")
  }

  /** q104: how much nation does market segment carry (it should be
    * ≈ 0 — the q91 independence finding, quantified in nats)? */
  def customerMutualInfo(spark: SparkSession, dir: String): DataFrame =
    mutualInfo(Tables.customer(spark, dir), "c_mktsegment", "c_nationkey")

  val customerMutualInfoSql: String = {
    val miTerm =
      s"CAST(floor(CAST(o AS DOUBLE) * (${lnSnap(
        "CAST(CAST(o AS HUGEINT) * n AS DOUBLE)" +
          " / CAST(CAST(rt AS HUGEINT) * ct AS DOUBLE)")}) * 1e9)" +
        " AS DECIMAL(38,0))"
    s"""WITH cells AS (
       |  SELECT c_mktsegment AS av, c_nationkey AS bv,
       |    CAST(count(*) AS BIGINT) AS o
       |  FROM customer
       |  WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
       |  GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |ha AS (
       |  SELECT $HTermSql AS s_ha FROM (
       |    SELECT av, CAST(sum(o) AS BIGINT) AS cnt FROM cells GROUP BY 1), tot),
       |hb AS (
       |  SELECT $HTermSql AS s_hb FROM (
       |    SELECT bv, CAST(sum(o) AS BIGINT) AS cnt FROM cells GROUP BY 1), tot),
       |ra AS (SELECT av, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
       |rb AS (SELECT bv, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
       |mi AS (
       |  SELECT CAST(max(n) AS BIGINT) AS n_rows,
       |    CAST(sum($miTerm) AS DECIMAL(38,0)) AS s_mi
       |  FROM cells
       |  JOIN ra USING (av) JOIN rb USING (bv) CROSS JOIN tot),
       |recovered AS (
       |  SELECT n_rows,
       |    CAST(s_ha AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e9 AS ha_raw,
       |    CAST(s_hb AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e9 AS hb_raw,
       |    CAST(s_mi AS DOUBLE) / nullif(CAST(n_rows AS DOUBLE), 0e0) / 1e9 AS mi_signed
       |  FROM mi, ha, hb),
       |clamped AS (
       |  SELECT n_rows, ha_raw, hb_raw,
       |    CASE WHEN mi_signed < 0e0 THEN 0e0 ELSE mi_signed END AS mi_raw
       |  FROM recovered)
       |SELECT n_rows,
       |  round(ha_raw, 6) + 0.0 AS h_a,
       |  round(hb_raw, 6) + 0.0 AS h_b,
       |  round(mi_raw, 6) + 0.0 AS mi,
       |  round(mi_raw / nullif(sqrt(ha_raw * hb_raw), 0e0), 6) + 0.0 AS nmi
       |FROM clamped""".stripMargin
  }

  /** q91: is market segment independent of nation across customers? */
  def customerChiSquare(spark: SparkSession, dir: String): DataFrame =
    chiSquare(Tables.customer(spark, dir), "c_mktsegment", "c_nationkey")

  val customerChiSquareSql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment AS av, c_nationkey AS bv, count(*) AS o
      |  FROM customer
      |  WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
      |  GROUP BY 1, 2),
      |ra AS (SELECT av, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |rb AS (SELECT bv, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |uni AS (
      |  SELECT ra.av, rb.bv, ra.rt, rb.ct, tot.n,
      |    coalesce(cells.o, 0) AS o
      |  FROM ra CROSS JOIN rb CROSS JOIN tot
      |  LEFT JOIN cells ON cells.av = ra.av AND cells.bv = rb.bv),
      |agg AS (
      |  SELECT max(n) AS n_rows,
      |    count(DISTINCT av) AS n_a, count(DISTINCT bv) AS n_b,
      |    CAST(sum(CAST(floor(CAST(o * n - rt * ct AS DOUBLE)
      |      * CAST(o * n - rt * ct AS DOUBLE)
      |      / CAST(n AS DOUBLE) / CAST(rt AS DOUBLE) / CAST(ct AS DOUBLE)
      |      * 1000000.0) AS BIGINT)) AS BIGINT) AS chi2_micro
      |  FROM uni)
      |SELECT n_rows, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof, chi2_micro,
      |  round(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)
      |    / nullif(CAST(n_rows AS DOUBLE) * CAST(least(n_a - 1, n_b - 1) AS DOUBLE), 0.0)), 6)
      |  + 0.0 AS cramers_v
      |FROM agg""".stripMargin
}
