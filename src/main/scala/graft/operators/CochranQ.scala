package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cochran's Q test — the BLOCKED BINARY design, the last cell of the
  * design matrix the deck already covers: q169 McNemar is the k = 2
  * special case (paired binary), q177 Friedman is the continuous
  * blocked analog, and Q asks whether k binary treatments have equal
  * "success" rates when every block (subject) is measured under ALL k
  * treatments. The right tool for panel questions like "do customers
  * use the five order priorities at the same rate?" — pooling ignores
  * that usage is correlated within a customer.
  *
  * Statistic (Cochran 1950): with x_{bj} ∈ {0,1}, C_j = Σ_b x_{bj}
  * (treatment totals), R_b = Σ_j x_{bj} (block totals), N = ΣC = ΣR:
  *
  *   Q = (k−1) · (k·ΣC_j² − N²) / (k·N − ΣR_b²)
  *
  * Blocks with R_b = 0 or R_b = k are uninformative (they cancel in
  * both numerator and denominator shifts) — the classical statistic
  * keeps them; n_informative reports how many blocks actually carry
  * signal. Q ~ χ²_{k−1} under H₀.
  *
  * Exactness: EVERY sufficient statistic (ΣC², ΣR², N, k) is an exact
  * BIGINT/DECIMAL(38,0) sum of 0/1 cells — no doubles until the ONE
  * shared-text Q ratio; an all-complete/all-empty panel drives the
  * denominator to 0 → NULL via nullif. χ² tail via the q173
  * Wilson–Hilferty chain (pow 1e-9-snapped) + A&S erfc.
  *
  * Plan/scale: one scan → DISTINCT (block, treatment) presence cells
  * (≤ subjects × k rows, shuffle on the natural key) → two keyed
  * aggregates (per-block, per-treatment — the per-treatment side is
  * dimension-grade) → a 1-row finish. No windows, no joins back. */
object CochranQ {

  /** Cochran's Q from a 0/1 presence frame with (b, w): one row per
    * (block, treatment) where x = 1; absent pairs are the 0 cells.
    * `k` must cover ALL treatments in the design (computed as the
    * distinct treatments observed). Returns one row:
    * (n_blocks, k_levels, n_ones, n_informative, q_stat, z_wh,
    * p_value). */
  def cochranQ(present: DataFrame): DataFrame = {
    val cells = present.select("b", "w").distinct().localCheckpoint(true)
    val k = cells.agg(expr("CAST(count(DISTINCT w) AS BIGINT)").as("k_levels"))
    val byBlock = cells.groupBy("b")
      .agg(expr("CAST(count(1) AS BIGINT)").as("rb"))
    val rstats = byBlock.crossJoin(broadcast(k)).agg(
      expr("CAST(count(1) AS BIGINT)").as("n_blocks"),
      expr("CAST(sum(rb) AS BIGINT)").as("n_ones"),
      expr("CAST(sum(CAST(rb AS DECIMAL(38,0)) * rb) AS DECIMAL(38,0))")
        .as("sr2"),
      expr("CAST(sum(CASE WHEN rb > 0 AND rb < k_levels" +
        " THEN 1 ELSE 0 END) AS BIGINT)").as("n_informative"),
      expr("CAST(max(k_levels) AS BIGINT)").as("k_levels"))
    val cstats = cells.groupBy("w")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cj"))
      .agg(expr("CAST(sum(CAST(cj AS DECIMAL(38,0)) * cj) AS DECIMAL(38,0))")
        .as("sc2"))
    rstats.crossJoin(broadcast(cstats))
      .selectExpr("n_blocks", "k_levels", "n_ones", "n_informative",
        "sr2", "sc2",
        s"round($QSql, 4) + 0.0 AS q_stat")
      .selectExpr("n_blocks", "k_levels", "n_ones", "n_informative",
        "q_stat", s"round($ZSql, 4) + 0.0 AS z_wh")
      .selectExpr("n_blocks", "k_levels", "n_ones", "n_informative",
        "q_stat", "z_wh",
        s"round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text Q — NULL when k < 2 or the denominator collapses
    * (every block all-0 or all-k). */
  private val QSql = {
    val kd = "CAST(k_levels AS DOUBLE)"
    val nd = "CAST(n_ones AS DOUBLE)"
    val num = s"($kd * CAST(sc2 AS DOUBLE) - $nd * $nd)"
    val den = s"($kd * $nd - CAST(sr2 AS DOUBLE))"
    s"(CASE WHEN k_levels < 2 THEN NULL" +
      s" ELSE ($kd - 1.0) * $num / nullif($den, 0.0) END)"
  }

  /** Wilson–Hilferty z at df = k − 1 (the q173 chain). */
  private val ZSql = {
    val df = "CAST(k_levels - 1 AS DOUBLE)"
    val cb = s"(CAST(floor(pow(q_stat / $df," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = s"(1.0 - 2.0 / (9.0 * $df))"
    val sd = s"sqrt(2.0 / (9.0 * $df))"
    s"(CASE WHEN k_levels < 2 THEN NULL ELSE ($cb - $mu) / $sd END)"
  }

  /** One-sided upper-tail normal p via the A&S 7.1.26 erfc chain. */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q179: do customers use the five order priorities at equal rates?
    * Blocks = customers with ≥1 order, treatment x = 1 iff the customer
    * ever placed an order at that priority. */
  def priorityUsageQ(spark: SparkSession, dir: String): DataFrame =
    cochranQ(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderpriority").isNotNull)
      .selectExpr("o_custkey AS b",
        "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w"))

  /** DuckDB twin: identical presence cells and sufficient statistics. */
  val priorityUsageQSql: String = {
    val q = QSql.replace("DECIMAL(38,0)", "HUGEINT")
    s"""WITH cells AS (
       |  SELECT DISTINCT o_custkey AS b,
       |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w
       |  FROM orders
       |  WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL),
       |kk AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS k_levels FROM cells),
       |by_block AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS rb FROM cells GROUP BY 1),
       |rstats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(sum(rb) AS BIGINT) AS n_ones,
       |    CAST(sum(CAST(rb AS HUGEINT) * rb) AS HUGEINT) AS sr2,
       |    CAST(sum(CASE WHEN rb > 0 AND rb < k_levels
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_informative,
       |    CAST(max(k_levels) AS BIGINT) AS k_levels
       |  FROM by_block CROSS JOIN kk),
       |cstats AS (
       |  SELECT CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT) AS sc2
       |  FROM (SELECT w, CAST(count(*) AS BIGINT) AS cj FROM cells GROUP BY 1)),
       |qrow AS (
       |  SELECT n_blocks, k_levels, n_ones, n_informative, sr2, sc2,
       |    round($q, 4) + 0.0 AS q_stat
       |  FROM rstats CROSS JOIN cstats),
       |z AS (
       |  SELECT n_blocks, k_levels, n_ones, n_informative, q_stat,
       |    round($ZSql, 4) + 0.0 AS z_wh
       |  FROM qrow)
       |SELECT n_blocks, k_levels, n_ones, n_informative, q_stat, z_wh,
       |  round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
  }
}
