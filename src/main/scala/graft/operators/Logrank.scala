package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-group log-rank test (Mantel–Cox) — the inference companion of
  * q110's Kaplan–Meier curves: "are these two survival curves the
  * same?" with right-censoring handled correctly (a Welch t on
  * observed lifetimes would be biased by censoring; the log-rank
  * statistic conditions on the risk sets). At each distinct event
  * time with d events out of n at risk (n₁/n₂ per arm, d₁ observed in
  * arm 1): E₁-term = d·n₁/n, V-term = [n₁n₂/n²]·[d(n−d)/(n−1)]
  * (hypergeometric), and z = (O₁−E₁)/√V is asymptotically standard
  * normal under H₀ (χ² = z² with 1 df).
  *
  * Exactness: O₁ is an exact BIGINT; the E and V terms are per-step
  * INTEGER MICRO-UNITS — e₁ᵗ = (10⁶·d·n₁) div n and
  * vᵗ = (a·d·(n−d)) div (n−1) with a = (10⁶·n₁·n₂) div (n·n) — so
  * only integers are summed (order-free; no double ever sums across
  * steps, the q91/q103 micro-sum move). The documented quantization
  * is the two nested floor divisions: e₁ᵗ loses ≤ 1 micro-unit per
  * step, but vᵗ's INNER floor (the a term, ≤ 1 micro-unit) is then
  * multiplied by d·(n−d)/(n−1) before the outer floor, so the vᵗ
  * drift is ≤ d·(n−d)/(n−1) + 1 ≈ d micro-units per step — summed,
  * up to ~total-events micro-units on V (NOT nano-level). That is
  * still ≤ ~N·1e-6 absolute on V while V itself grows ∝ events, so
  * the relative V error stays ~1e-6 and sits far below the round-4 z
  * snap at the supported scales — but anyone re-sizing the fixed
  * point for much larger d should budget ~d micro-units per step,
  * not 1. z is ONE shared-text double chain
  * from the three integer sums, round-4 snapped before the A&S erfc
  * p (the q100 convention). Magnitude: 10⁶·d·n₁ ≤ 10⁶·N² and
  * a·d·(n−d) ≤ 2.5·10⁵·N²/4 — Longs hold through N ≈ 10⁶ subjects;
  * past that the sums swap to DECIMAL(38,0) (the q82 stance).
  *
  * Plan/scale: observations → ONE duration-keyed aggregate producing
  * per-time arm counts (map-side combined), cumulative at-risk via a
  * window over the GLOBAL duration spine — bounded by the observation
  * span in days (the q110/q115 calendar-cell class), never by subject
  * count — then one 1-row aggregate. Arm totals are a broadcast
  * 1-row frame. */
object Logrank {

  /** Censoring horizon (days before the dataset's last order), the
    * q110 convention. */
  val CensorDays = 90

  /** Log-rank over an observation frame (arm ∈ {0,1}, dur, event):
    * one row — arm sizes, O₁, E₁, V, z, χ², p. Delegates to the keyed
    * core with a constant stratum (same integer program; the global
    * single-partition duration window the core warns about is bounded
    * by the observation span in days, the q110 calendar-cell class). */
  def logrank(obs: DataFrame): DataFrame =
    logrankBy(obs.withColumn("__stratum", lit(0)), "__stratum")
      .drop("__stratum")

  /** Per-group (stratum-level) log-rank — the q89/q95 grouped-model
    * move applied to the integer sufficient statistics: ONE keyed
    * aggregate per stage (cells keyed by (seg, dur), at-risk windows
    * PARTITIONED by seg, arm totals a dimension-grade broadcast), so
    * every segment's test runs in the same three shuffles — no
    * per-group jobs, no driver loop. One output row per segment. */
  def logrankBy(obs: DataFrame, seg: String): DataFrame = {
    // cells is (stratum × duration-spine)-bounded — dimension-grade by
    // this operator's own precondition — and consumed TWICE (arm
    // totals + the at-risk steps): checkpoint so the observation
    // subtree (scans, joins) runs once (the round-9 no-duplicate-
    // subtree rule; Spark does not CSE repeated frames)
    val cells = obs.groupBy(seg, "dur").agg(
      expr("CAST(sum(arm) AS BIGINT)").as("n1_all"),
      expr("CAST(sum(arm * event) AS BIGINT)").as("d1"),
      expr("CAST(sum(1 - arm) AS BIGINT)").as("n2_all"),
      expr("CAST(sum((1 - arm) * event) AS BIGINT)").as("d2"))
      .localCheckpoint(true)
    val totals = cells.groupBy(seg).agg(
      expr("CAST(sum(n1_all) AS BIGINT)").as("tn1"),
      expr("CAST(sum(n2_all) AS BIGINT)").as("tn2"))
    val wBelow = Window.partitionBy(seg).orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = cells
      .join(broadcast(totals), Seq(seg))
      .withColumn("n1",
        col("tn1") - coalesce(sum("n1_all").over(wBelow), lit(0L)))
      .withColumn("n2",
        col("tn2") - coalesce(sum("n2_all").over(wBelow), lit(0L)))
      .selectExpr(seg, "tn1", "tn2", "d1", "d2", "n1", "n2",
        "d1 + d2 AS d", "n1 + n2 AS n")
      .filter(col("d") > 0 && col("n") > 1)
      .selectExpr(seg, "tn1", "tn2", "d1",
        "(1000000 * d * n1) div n AS e1_t",
        "(((1000000 * n1 * n2) div (n * n)) * d * (n - d)) div (n - 1) AS v_t")
    steps.groupBy(seg, "tn1", "tn2").agg(
      expr("CAST(sum(d1) AS BIGINT)").as("o1"),
      expr("CAST(sum(e1_t) AS BIGINT)").as("e1_micro"),
      expr("CAST(sum(v_t) AS BIGINT)").as("v_micro"))
      .selectExpr(seg, "tn1 AS n_arm1", "tn2 AS n_arm2", "o1",
        "round(CAST(e1_micro AS DOUBLE) / 1e6, 6) + 0.0 AS e1",
        "round(CAST(v_micro AS DOUBLE) / 1e6, 6) + 0.0 AS v",
        s"round($ZSql, 4) + 0.0 AS z_lr")
      .selectExpr(seg, "n_arm1", "n_arm2", "o1", "e1", "v", "z_lr",
        "round(z_lr * z_lr, 6) + 0.0 AS chi2",
        s"round(${pSql("z_lr")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text z from the three integer sums (NULL when V = 0 —
    * no events or a degenerate single-arm spine). */
  private val ZSql =
    "(CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1e6)" +
      " / sqrt(nullif(CAST(v_micro AS DOUBLE), 0.0) / 1e6)"

  /** Two-sided normal p via A&S 7.1.26 from a round-4-snapped z (the
    * q94/q100 shared chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** The shared q159/q161 observation frame: per-customer duration
    * (first→last order days), censoring within [[CensorDays]] of the
    * dataset end, arm = BUILDING segment vs rest, with the customer's
    * nation key carried for stratification. */
  private def custObs(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").as("d"))
      .groupBy("o_custkey")
      .agg(min("d").as("first_d"), max("d").as("last_d"))
      .localCheckpoint(true) // censor anchor + obs both read it
    val mx = perCust.agg(max("last_d").as("mx"))
    perCust
      .crossJoin(broadcast(mx))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_nationkey",
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm",
        "CAST(last_d - first_d AS BIGINT) AS dur",
        s"CASE WHEN last_d < mx - $CensorDays THEN 1 ELSE 0 END AS event")
  }

  /** q159: does the BUILDING segment's customer-lifetime curve differ
    * from everyone else's — the q110 observation frame (duration =
    * first→last order days, censored within [[CensorDays]] of the
    * dataset end) split into two arms. */
  def segmentLogrank(spark: SparkSession, dir: String): DataFrame =
    logrank(custObs(spark, dir).select("arm", "dur", "event"))

  /** q161: the q159 comparison STRATIFIED by the customer's region —
    * does the BUILDING effect hold within every region, or is the
    * pooled z a mix artifact? One row per region via [[logrankBy]]
    * (three keyed shuffles total for all strata; nation→region are
    * broadcast dims). */
  def regionSegmentLogrank(spark: SparkSession, dir: String): DataFrame = {
    val regions = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
      .join(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name").as("region")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "region")
    val obs = custObs(spark, dir)
      .join(broadcast(regions), col("c_nationkey") === col("n_nationkey"))
    logrankBy(obs.select("region", "arm", "dur", "event"), "region")
  }

  /** DuckDB twin: identical cells, at-risk windows, micro terms, z/p. */
  val segmentLogrankSql: String =
    s"""WITH per_cust AS (
       |  SELECT o_custkey,
       |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
       |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |mx AS (SELECT max(last_d) AS mx FROM per_cust),
       |obs AS (
       |  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm,
       |    last_d - first_d AS dur,
       |    CASE WHEN last_d < mx - $CensorDays THEN 1 ELSE 0 END AS event
       |  FROM per_cust CROSS JOIN mx
       |  JOIN customer ON o_custkey = c_custkey),
       |cells AS (
       |  SELECT dur,
       |    CAST(sum(arm) AS BIGINT) AS n1_all,
       |    CAST(sum(arm * event) AS BIGINT) AS d1,
       |    CAST(sum(1 - arm) AS BIGINT) AS n2_all,
       |    CAST(sum((1 - arm) * event) AS BIGINT) AS d2
       |  FROM obs GROUP BY 1),
       |tot AS (SELECT CAST(sum(n1_all) AS BIGINT) AS tn1,
       |               CAST(sum(n2_all) AS BIGINT) AS tn2 FROM cells),
       |risk AS (
       |  SELECT tn1, tn2, d1, d2,
       |    CAST(tn1 - coalesce(sum(n1_all) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1,
       |    CAST(tn2 - coalesce(sum(n2_all) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n2
       |  FROM cells CROSS JOIN tot),
       |steps AS (
       |  SELECT tn1, tn2, d1,
       |    (1000000 * d * n1) // n AS e1_t,
       |    (((1000000 * n1 * n2) // (n * n)) * d * (n - d)) // (n - 1) AS v_t
       |  FROM (SELECT tn1, tn2, d1, d2, n1, n2,
       |          d1 + d2 AS d, n1 + n2 AS n FROM risk)
       |  WHERE d > 0 AND n > 1),
       |agg AS (
       |  SELECT tn1, tn2,
       |    CAST(sum(d1) AS BIGINT) AS o1,
       |    CAST(sum(e1_t) AS BIGINT) AS e1_micro,
       |    CAST(sum(v_t) AS BIGINT) AS v_micro
       |  FROM steps GROUP BY 1, 2),
       |z AS (
       |  SELECT tn1 AS n_arm1, tn2 AS n_arm2, o1,
       |    round(CAST(e1_micro AS DOUBLE) / 1e6, 6) + 0.0 AS e1,
       |    round(CAST(v_micro AS DOUBLE) / 1e6, 6) + 0.0 AS v,
       |    round($ZSql, 4) + 0.0 AS z_lr
       |  FROM agg)
       |SELECT n_arm1, n_arm2, o1, e1, v, z_lr,
       |  round(z_lr * z_lr, 6) + 0.0 AS chi2,
       |  round(${pSql("z_lr")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin

  /** DuckDB twin of q161: the q159 program with every stage keyed by
    * region (cells GROUP BY region+dur, at-risk windows PARTITION BY
    * region, totals per region). */
  val regionSegmentLogrankSql: String =
    s"""WITH per_cust AS (
       |  SELECT o_custkey,
       |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
       |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |mx AS (SELECT max(last_d) AS mx FROM per_cust),
       |obs AS (
       |  SELECT r_name AS region,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm,
       |    last_d - first_d AS dur,
       |    CASE WHEN last_d < mx - $CensorDays THEN 1 ELSE 0 END AS event
       |  FROM per_cust CROSS JOIN mx
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey),
       |cells AS (
       |  SELECT region, dur,
       |    CAST(sum(arm) AS BIGINT) AS n1_all,
       |    CAST(sum(arm * event) AS BIGINT) AS d1,
       |    CAST(sum(1 - arm) AS BIGINT) AS n2_all,
       |    CAST(sum((1 - arm) * event) AS BIGINT) AS d2
       |  FROM obs GROUP BY 1, 2),
       |tot AS (SELECT region, CAST(sum(n1_all) AS BIGINT) AS tn1,
       |               CAST(sum(n2_all) AS BIGINT) AS tn2
       |        FROM cells GROUP BY 1),
       |risk AS (
       |  SELECT c.region, tn1, tn2, d1, d2,
       |    CAST(tn1 - coalesce(sum(n1_all) OVER (PARTITION BY c.region
       |      ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1,
       |    CAST(tn2 - coalesce(sum(n2_all) OVER (PARTITION BY c.region
       |      ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n2
       |  FROM cells c JOIN tot USING (region)),
       |steps AS (
       |  SELECT region, tn1, tn2, d1,
       |    (1000000 * d * n1) // n AS e1_t,
       |    (((1000000 * n1 * n2) // (n * n)) * d * (n - d)) // (n - 1) AS v_t
       |  FROM (SELECT region, tn1, tn2, d1, d2, n1, n2,
       |          d1 + d2 AS d, n1 + n2 AS n FROM risk)
       |  WHERE d > 0 AND n > 1),
       |agg AS (
       |  SELECT region, tn1, tn2,
       |    CAST(sum(d1) AS BIGINT) AS o1,
       |    CAST(sum(e1_t) AS BIGINT) AS e1_micro,
       |    CAST(sum(v_t) AS BIGINT) AS v_micro
       |  FROM steps GROUP BY 1, 2, 3),
       |z AS (
       |  SELECT region, tn1 AS n_arm1, tn2 AS n_arm2, o1,
       |    round(CAST(e1_micro AS DOUBLE) / 1e6, 6) + 0.0 AS e1,
       |    round(CAST(v_micro AS DOUBLE) / 1e6, 6) + 0.0 AS v,
       |    round($ZSql, 4) + 0.0 AS z_lr
       |  FROM agg)
       |SELECT region, n_arm1, n_arm2, o1, e1, v, z_lr,
       |  round(z_lr * z_lr, 6) + 0.0 AS chi2,
       |  round(${pSql("z_lr")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
