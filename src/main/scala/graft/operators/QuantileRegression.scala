package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Quantile regression (pinball / check loss, Koenker & Bassett 1978)
  * — the conditional-QUANTILE line beside q32's conditional mean and
  * q102's robust slope: "how does the P90 move with x" is a different
  * (and for SLA/tail questions, the right) object from "how does the
  * mean move", and a mean fit cannot answer it.
  *
  * Estimator: minimize Σ ρ_τ(y − b0 − b1·x), ρ_τ(r) = r·(τ − 1{r<0}),
  * via iteratively reweighted least squares (the Schlossmacher 1973
  * L1 device at general τ): w = (τ if r > 0 else 1−τ) / max(|r|, ε)
  * makes w·r² a tangent majorizer of ρ_τ, so each WLS step descends
  * the pinball objective; [[Iters]] fixed iterations from an OLS warm
  * start, ε = 1e-6 (the standard IRLS floor — also the documented
  * resolution limit: coefficients are exact to well under the round-6
  * display at these n). All TAUS fit simultaneously — but NOT by
  * crossing the rows with a τ frame: w is a pure expression of
  * (r, τ), so each iteration computes the 5 sufficient statistics for
  * EVERY τ as conditional (per-τ weight) aggregate columns in ONE
  * pass over the fact rows. A |τ|-way crossJoin would scan and
  * shuffle |τ|× the rows per pass for no information gain (the r13
  * verdict's finding — the fused form halved q164/q166).
  *
  * Cross-engine exactness: the whole chain is RATIONAL arithmetic —
  * no exp/ln anywhere — so unlike q94 there is NOTHING to snap: the
  * per-iteration sufficient statistics are fixed-point DECIMAL(38,0)
  * sums (order-free exact integers), the 2×2 Cramer solve and the
  * weight formula are shared SQL text (the DuckDB twin keeps the
  * explicit τ cross-join form — parity is on VALUES, not plans: τ
  * enters the Spark side as the same CAST(… AS DOUBLE) literal the
  * twin's τ column carries, so every double op sequence is bitwise
  * identical in both engines through all iterations).
  *
  * Plan/scale: localCheckpoint the prepared rows once; each iteration
  * is ONE map-side-combined aggregate keyed by the groups (shuffle
  * carries 5·|τ| numbers per group) + a broadcast join of the
  * group-grade wide coefficient frame — no driver loop over data, no
  * per-tau jobs, no τ row duplication. */
object QuantileRegression {

  /** Fitted quantiles as shared literal text (Spark + oracle). */
  val Taus = Seq("0.5", "0.9")
  /** IRLS iterations (fixed — determinism over adaptivity, q94). */
  val Iters = 8
  /** Fixed-point snap scale for sufficient-statistic terms (q32). */
  val FixedScale = 1000000.0

  /** The 5 WLS sufficient statistics as expressions of a weight
    * column/expression `w` — parametrized so the fused per-τ path
    * (w_0, w_1, …) and the oracle twin (a single w column) share the
    * exact arithmetic text. */
  private def termsFor(w: String): Seq[(String, String)] = Seq(
    "sw" -> w,
    "sx" -> s"$w * x",
    "sxx" -> s"$w * x * x",
    "sy" -> s"$w * y",
    "sxy" -> s"$w * x * y",
  )
  private val Terms: Seq[(String, String)] = termsFor("w")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  /** Spark-side exact fixed-point sum: graft's sum128 aggregate — the
    * same integer and DECIMAL(38,0) result as the twin's
    * `sum(CAST(floor(…) AS DECIMAL(38,0)))` text, at long-sum speed
    * (primitive 128-bit limb buffers instead of per-row Decimal
    * updates; see [[graft.functions.expressions.SumInt128]]). */
  private def sum128Sql(t: String): String =
    s"sum128(CAST(floor(($t) * $FixedScale) AS BIGINT))"
  private def sumsSql: String = Terms.map { case (n, t) =>
    s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0)) AS ${n}_i"
  }.mkString(", ")
  private def recSql: String = Terms.map { case (n, _) =>
    s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
  }.mkString(", ")

  // 2×2 Cramer (shared text): [sw sx; sx sxx]·[b0 b1] = [sy sxy]
  private val DetSql = "(sw * sxx - sx * sx)"
  private val B0Sql = "(sxx * sy - sx * sxy)"
  private val B1Sql = "(sw * sxy - sx * sy)"
  private val GuardSql = s"n_rows >= 2 AND abs($DetSql) > 1.0 / $FixedScale"
  private def etaSqlFor(b0: String, b1: String): String = s"$b0 + $b1 * x"
  private val EtaSql = etaSqlFor("b0", "b1")
  /** IRLS majorizer weight; the CASE and the ε floor are shared text,
    * and r = y − eta is bitwise identical both engines (rational
    * chain), so the branch never diverges. Parametrized on the τ and
    * eta SPELLING only — the fused path passes the same
    * CAST(… AS DOUBLE) literal the twin's τ column carries. */
  private def wSqlFor(tau: String, eta: String): String =
    s"(CASE WHEN y - $eta > 0.0 THEN $tau ELSE 1.0 - $tau END)" +
      s" / greatest(abs(y - $eta), 1e-6)"
  private val WSql = wSqlFor("tau", "eta")
  /** Pinball loss term (≥ 0) for the objective report. */
  private def pinSqlFor(tau: String, eta: String): String =
    s"(y - $eta) * ($tau - (CASE WHEN y - $eta < 0.0 THEN 1.0 ELSE 0.0 END))"
  private val PinSql = pinSqlFor("tau", "eta")
  /** Rename the 5 stat names to their per-τ suffixed spellings inside
    * a shared SQL fragment (word-bounded, so `sx` never eats `sxx`). */
  private def suffixed(sqlText: String, j: Int): String =
    Terms.foldLeft(sqlText) { case (acc, (n, _)) =>
      acc.replaceAll(s"\\b$n\\b", s"${n}_$j")
    }

  /** Quantile fits over a prepared frame with double columns (x, y):
    * one row per τ — n_rows, tau, coefficients, mean pinball loss,
    * and the below-line fraction (≈ τ at the optimum — the built-in
    * calibration check). */
  def quantileFit(rows: DataFrame, taus: Seq[String] = Taus,
      iters: Int = Iters): DataFrame =
    quantileFitBy(rows, Seq.empty, taus, iters)

  /** Per-group quantile fits — the q89/q95 grouped-model move: the
    * election keys become (groups…, tau), so a thousand segment-level
    * P50/P90 fits cost the SAME iters+2 keyed aggregates (shuffle
    * carries 5 numbers per (group, τ) cell) and one broadcast
    * coefficient join per iteration — no per-group jobs, no driver
    * loop. Degenerate cells (n < 2 or singular) carry NULLs from the
    * warm start onward, never garbage. */
  def quantileFitBy(rows: DataFrame, groups: Seq[String],
      taus: Seq[String] = Taus, iters: Int = Iters): DataFrame = {
    // explicit DOUBLE: a bare 0.5 literal parses as DECIMAL in Spark,
    // and decimal tau would propagate a different type (and different
    // last-ulp products) than the oracle's DOUBLE chain
    val tauLit: Seq[String] = taus.map(t => s"CAST($t AS DOUBLE)")
    val J = taus.indices
    val pinned = rows.select(groups.map(col) ++ Seq(
        col("x").cast("double").as("x"),
        col("y").cast("double").as("y")): _*)
      .localCheckpoint(true) // iters+2 aggregate passes re-read it
    // ONE pass per iteration: each τ's 5 sufficient statistics are
    // conditional aggregate columns over the SAME scan — never a
    // |τ|-way row duplication. src carries w_0..w_{|τ|-1}.
    def statsWide(src: DataFrame): DataFrame =
      src.groupBy(groups.map(col): _*)
        .agg(count(lit(1)).as("n_rows"),
          J.flatMap(j => termsFor(s"w_$j").map { case (n, t) =>
            expr(sum128Sql(t)).as(s"${n}_${j}_i")
          }): _*)
    // guarded per-τ 2×2 Cramer solves over the wide stat columns —
    // the identical shared text with per-τ suffixed stat names
    def solveWide(stats: DataFrame): DataFrame =
      stats
        .select(groups.map(col) ++ (col("n_rows") +: J.flatMap(j =>
          Terms.map { case (n, _) =>
            expr(s"CAST(${n}_${j}_i AS DOUBLE) / $FixedScale").as(s"${n}_$j")
          })): _*)
        .select(groups.map(col) ++ (col("n_rows") +: J.flatMap(j => Seq(
          expr(s"CASE WHEN ${suffixed(GuardSql, j)} THEN" +
            s" ${suffixed(B0Sql, j)} / nullif(${suffixed(DetSql, j)}, 0.0)" +
            s" END").as(s"b0_$j"),
          expr(s"CASE WHEN ${suffixed(GuardSql, j)} THEN" +
            s" ${suffixed(B1Sql, j)} / nullif(${suffixed(DetSql, j)}, 0.0)" +
            s" END").as(s"b1_$j")))): _*)
    // bring the group-grade wide coefficient frame to every row
    def joined(bw: DataFrame): DataFrame = {
      val sel = bw.select(groups.map(col) ++
        J.flatMap(j => Seq(col(s"b0_$j"), col(s"b1_$j"))): _*)
      if (groups.isEmpty) pinned.crossJoin(broadcast(sel))
      else pinned.join(broadcast(sel), groups)
    }
    // the coefficient frame is group-grade and feeds the NEXT
    // iteration's join: materialize it per iteration so the final
    // plan is `iters` SHALLOW jobs, not one deep lazy chain — without
    // this, Catalyst re-optimizes and codegen-compiles the whole
    // unrolled cascade as a single 100+-node plan (measured
    // 11.7s → ~2s at sf0.1; the q147 materialize-per-round lesson)
    def solved(src: DataFrame): DataFrame =
      solveWide(statsWide(src)).localCheckpoint(true)
    var b = solved(pinned.selectExpr(groups ++ Seq("x", "y") ++
      J.map(j => s"1.0 AS w_$j"): _*))
    for (_ <- 0 until iters) {
      val working = joined(b)
        .selectExpr(groups ++ Seq("x", "y") ++ J.map(j =>
          s"${etaSqlFor(s"b0_$j", s"b1_$j")} AS eta_$j"): _*)
        .selectExpr(groups ++ Seq("x", "y") ++ J.map(j =>
          s"${wSqlFor(tauLit(j), s"eta_$j")} AS w_$j"): _*)
      b = solved(working)
    }
    // final pass: per-τ pinball + calibration counts, again one scan
    val agg = joined(b)
      .selectExpr(groups ++ Seq("y") ++ J.map(j =>
        s"${etaSqlFor(s"b0_$j", s"b1_$j")} AS eta_$j"): _*)
      .groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        J.flatMap(j => Seq(
          expr(sum128Sql(pinSqlFor(tauLit(j), s"eta_$j"))).as(s"sp_i_$j"),
          expr(s"CAST(sum(CASE WHEN y <= eta_$j THEN 1 ELSE 0 END)" +
            " AS BIGINT)").as(s"below_$j"))): _*)
    val bw = b.drop("n_rows")
    val withB =
      if (groups.isEmpty) agg.crossJoin(broadcast(bw))
      else agg.join(broadcast(bw), groups)
    withB
      .select(groups.map(col) ++ Seq(col("n_rows"),
        explode(array(J.map(j => struct(
          expr(tauLit(j)).as("tau"),
          col(s"sp_i_$j").as("sp_i"), col(s"below_$j").as("below"),
          col(s"b0_$j").as("b0"), col(s"b1_$j").as("b1"))): _*)).as("t")): _*)
      .select(groups.map(col) ++ Seq(col("t.tau").as("tau"), col("n_rows"),
        col("t.sp_i").as("sp_i"), col("t.below").as("below"),
        col("t.b0").as("b0"), col("t.b1").as("b1")): _*)
      .selectExpr((groups :+ "tau") ++ Seq("n_rows",
        "round(b0, 6) + 0.0 AS b_intercept",
        "round(b1, 6) + 0.0 AS b_slope",
        s"round(CAST(sp_i AS DOUBLE) / $FixedScale" +
          " / CAST(n_rows AS DOUBLE), 6) + 0.0 AS pinball_mean",
        "round(CAST((1000000 * below) div n_rows AS DOUBLE) / 1e6, 6)" +
          " + 0.0 AS frac_below"): _*)
  }

  /** q164: tail line revenue vs order-line size — the P50/P90 of
    * l_extendedprice (in k$, keeping features O(10²) per the q32
    * scaling note) as a line in l_quantity. The mean fit (q32's
    * object) gives the average unit price; how the TAIL revenue scales
    * with quantity — do big lines of EXPENSIVE parts exist — is a
    * quantile question a mean cannot answer. */
  def lineRevenue(spark: SparkSession, dir: String): DataFrame =
    quantileFit(Tables.lineitem(spark, dir)
      .selectExpr("CAST(l_quantity AS DOUBLE) AS x",
        "CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y"))

  /** q166: the q164 tail-revenue line PER BRAND — 25 brands × 2 τs =
    * 50 simultaneous fits in the same iters+2 aggregates; the brand
    * dimension arrives by broadcast part join. Which brands' P90
    * revenue grows super-proportionally with quantity is the
    * assortment question the pooled q164 line averages away. */
  def brandLineRevenue(spark: SparkSession, dir: String): DataFrame =
    quantileFitBy(
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .selectExpr("p_brand",
          "CAST(l_quantity AS DOUBLE) AS x",
          "CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y"),
      Seq("p_brand"))

  /** DuckDB twin of q166: the q164 cascade keyed by (p_brand, tau). */
  val brandLineRevenueSql: String = {
    def solveCte(k: Int, src: String): String =
      s"""r$k AS (SELECT p_brand, tau, n_rows, $recSql FROM $src),
         |c$k AS (SELECT p_brand, tau,
         |  CASE WHEN $GuardSql THEN $B0Sql / nullif($DetSql, 0.0) END AS b0,
         |  CASE WHEN $GuardSql THEN $B1Sql / nullif($DetSql, 0.0) END AS b1
         |FROM r$k)""".stripMargin
    val iterCtes = (1 to Iters).map { k =>
      s"""wrk$k AS (
         |  SELECT p_brand, tau, $WSql AS w, x, y
         |  FROM (SELECT b.p_brand, b.tau, b.x, b.y, $EtaSql AS eta
         |        FROM base b JOIN c${k - 1} USING (p_brand, tau))),
         |s$k AS (SELECT p_brand, tau, count(*) AS n_rows, $sumsSql
         |FROM wrk$k GROUP BY 1, 2),
         |${solveCte(k, s"s$k")}""".stripMargin
    }.mkString(",\n")
    s"""WITH rws AS (
       |  SELECT p_brand, CAST(l_quantity AS DOUBLE) AS x,
       |    CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |taus(tau) AS (VALUES (CAST(${Taus.head} AS DOUBLE))${
      Taus.tail.map(t => s", (CAST($t AS DOUBLE))").mkString}),
       |base AS (SELECT p_brand, tau, x, y FROM rws CROSS JOIN taus),
       |s0 AS (SELECT p_brand, tau, count(*) AS n_rows, $sumsSql
       |FROM (SELECT p_brand, tau, 1.0 AS w, x, y FROM base) GROUP BY 1, 2),
       |${solveCte(0, "s0")},
       |$iterCtes,
       |fin AS (
       |  SELECT b.p_brand, b.tau, b.x, b.y, b0, b1, $EtaSql AS eta
       |  FROM base b JOIN c$Iters USING (p_brand, tau)),
       |agg AS (
       |  SELECT p_brand, tau, count(*) AS n_rows,
       |    CAST(sum(${fixedSql(PinSql)}) AS DECIMAL(38,0)) AS sp_i,
       |    CAST(sum(CASE WHEN y <= eta THEN 1 ELSE 0 END) AS BIGINT) AS below,
       |    first(b0) AS b0, first(b1) AS b1
       |  FROM fin GROUP BY 1, 2)
       |SELECT p_brand, tau, n_rows,
       |  round(b0, 6) + 0.0 AS b_intercept,
       |  round(b1, 6) + 0.0 AS b_slope,
       |  round(CAST(sp_i AS DOUBLE) / $FixedScale
       |    / CAST(n_rows AS DOUBLE), 6) + 0.0 AS pinball_mean,
       |  round(CAST((1000000 * below) // n_rows AS DOUBLE) / 1e6, 6)
       |    + 0.0 AS frac_below
       |FROM agg""".stripMargin
  }

  /** DuckDB twin: the keyed CTE cascade from the same shared
    * fragments — tau cross join, fixed-point sums, guarded 2×2
    * solves, USING joins, unrolled [[Iters]] times. */
  val lineRevenueSql: String = {
    def solveCte(k: Int, src: String): String =
      s"""r$k AS (SELECT tau, n_rows, $recSql FROM $src),
         |c$k AS (SELECT tau,
         |  CASE WHEN $GuardSql THEN $B0Sql / nullif($DetSql, 0.0) END AS b0,
         |  CASE WHEN $GuardSql THEN $B1Sql / nullif($DetSql, 0.0) END AS b1
         |FROM r$k)""".stripMargin
    val iterCtes = (1 to Iters).map { k =>
      s"""wrk$k AS (
         |  SELECT tau, $WSql AS w, x, y
         |  FROM (SELECT b.tau, b.x, b.y, $EtaSql AS eta
         |        FROM base b JOIN c${k - 1} USING (tau))),
         |s$k AS (SELECT tau, count(*) AS n_rows, $sumsSql
         |FROM wrk$k GROUP BY tau),
         |${solveCte(k, s"s$k")}""".stripMargin
    }.mkString(",\n")
    s"""WITH rws AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x,
       |    CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y
       |  FROM lineitem),
       |taus(tau) AS (VALUES (CAST(${Taus.head} AS DOUBLE))${
      Taus.tail.map(t => s", (CAST($t AS DOUBLE))").mkString}),
       |base AS (SELECT tau, x, y FROM rws CROSS JOIN taus),
       |s0 AS (SELECT tau, count(*) AS n_rows, $sumsSql
       |FROM (SELECT tau, 1.0 AS w, x, y FROM base) GROUP BY tau),
       |${solveCte(0, "s0")},
       |$iterCtes,
       |fin AS (
       |  SELECT b.tau, b.x, b.y, b0, b1, $EtaSql AS eta
       |  FROM base b JOIN c$Iters USING (tau)),
       |agg AS (
       |  SELECT tau, count(*) AS n_rows,
       |    CAST(sum(${fixedSql(PinSql)}) AS DECIMAL(38,0)) AS sp_i,
       |    CAST(sum(CASE WHEN y <= eta THEN 1 ELSE 0 END) AS BIGINT) AS below,
       |    first(b0) AS b0, first(b1) AS b1
       |  FROM fin GROUP BY tau)
       |SELECT tau, n_rows,
       |  round(b0, 6) + 0.0 AS b_intercept,
       |  round(b1, 6) + 0.0 AS b_slope,
       |  round(CAST(sp_i AS DOUBLE) / $FixedScale
       |    / CAST(n_rows AS DOUBLE), 6) + 0.0 AS pinball_mean,
       |  round(CAST((1000000 * below) // n_rows AS DOUBLE) / 1e6, 6)
       |    + 0.0 AS frac_below
       |FROM agg""".stripMargin
  }
}
