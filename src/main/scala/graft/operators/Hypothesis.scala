package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-sample and k-sample hypothesis tests — the "is this difference
  * real?" layer that sits on top of the descriptive operators (q8
  * z-scores, q68 correlation, q91 chi-square). The reference's whole
  * analysis deliverable is inference (`run_analysis.Rmd:110-117`
  * reports GLM standard errors and p-values); these operators are the
  * same question asked of group comparisons: Welch's unequal-variance
  * t-test, the rank-based Mann–Whitney U (the nonparametric fallback
  * when normality is off the table), and one-way ANOVA's F for k > 2
  * groups. All three reduce to one scan + a group-level aggregate, so
  * they price the same at 100 TB as any other map-side-combined
  * summary.
  *
  * Exactness (the q68/q91 contract): every order-dependent sum crosses
  * the engine boundary as an EXACT integer — values snapped per-row by
  * a shared `floor(v * scale)` text and summed as DECIMAL(38,0)
  * (order-free), ranks carried as the integer 2·avgRank — and the
  * statistic itself is ONE shared-text double chain over the recovered
  * sums, so every IEEE op has identical operands in identical order on
  * both engines. `greatest(·, 0e0)` clamps the variance numerators:
  * with exact sums a zero variance is EXACTLY zero, but the n·Σx²−(Σx)²
  * form can round to a last-ulp negative, and DuckDB hard-errors on
  * sqrt of a negative. NULL conventions: a side with n < 2 has no
  * variance → t/df NULL; zero pooled SE → t NULL; one group → F NULL
  * (all via nullif, never ANSI errors).
  */
object Hypothesis {

  // ---------------------------------------------------------------- Welch t

  /** Shared aggregate terms for one class side of the Welch test.
    * `v` is the pre-snapped integer value (cents): BIGINT on Spark,
    * integer-valued DOUBLE on DuckDB — v·v ≤ ~3.6e15 < 2^53 stays
    * exact in both, and the DECIMAL(38,0) sum is order-free. */
  private def sideTerms(side: String, cls: String): Seq[(String, String)] = Seq(
    s"n_$side" -> s"CAST(sum(CASE WHEN cls = '$cls' THEN 1 ELSE 0 END) AS BIGINT)",
    s"s_$side" -> s"CAST(sum(CASE WHEN cls = '$cls' THEN CAST(v AS DECIMAL(38,0)) END) AS DECIMAL(38,0))",
    s"q_$side" -> s"CAST(sum(CASE WHEN cls = '$cls' THEN CAST(floor(v * v) AS DECIMAL(38,0)) END) AS DECIMAL(38,0))")

  /** Sample variance s² = (n·Σx² − (Σx)²) / (n·(n−1)) over recovered
    * doubles; greatest clamps last-ulp negatives, nullif NULLs n < 2. */
  private def varSql(side: String): String =
    s"greatest(n${side}d * q${side}d - s${side}d * s${side}d, 0e0)" +
      s" / nullif(n${side}d * (n${side}d - 1e0), 0e0)"

  /** s²/n for one side — the Welch standard-error component. */
  private def seSql(side: String): String =
    s"${varSql(side)} / nullif(n${side}d, 0e0)"

  /** Welch's t-test of `valueCol` between `clsA` and `clsB` rows of
    * `classCol`, per `groupCol` group. Returns one row per group:
    * (group, n_a, n_b, mean_a, mean_b, t_welch, df_welch) with the
    * Welch–Satterthwaite df. `scale` is the fixed-point snap for the
    * measure (1e2 for 2-decimal money — the documented quantization of
    * the statistic, not an approximation of it).
    *
    * Plan: one filtered scan, one map-side-combined group aggregate
    * (6 exact sums + 2 counts), then a scalar projection. */
  def welchTTest(df: DataFrame, groupCol: String, classCol: String,
      clsA: String, clsB: String, valueCol: String,
      scale: String = "1e2"): DataFrame = {
    val prep = df
      .filter(col(classCol).isin(clsA, clsB) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(classCol).as("cls"),
        expr(s"floor($valueCol * $scale)").as("v"))
    val terms = sideTerms("a", clsA) ++ sideTerms("b", clsB)
    val agg = prep.groupBy("g")
      .agg(expr(terms.head._2).as(terms.head._1),
        terms.tail.map { case (n, t) => expr(t).as(n) }: _*)
    val recovered = agg.selectExpr(
      Seq("g", "n_a", "n_b") ++
        Seq("a", "b").flatMap(s => Seq(
          s"CAST(n_$s AS DOUBLE) AS n${s}d",
          s"CAST(s_$s AS DOUBLE) AS s${s}d",
          s"CAST(q_$s AS DOUBLE) AS q${s}d")): _*)
    recovered.selectExpr(
      s"g AS $groupCol", "n_a", "n_b",
      s"round(sad / nullif(nad, 0e0) / $scale, 4) + 0.0 AS mean_a",
      s"round(sbd / nullif(nbd, 0e0) / $scale, 4) + 0.0 AS mean_b",
      s"round((sad / nullif(nad, 0e0) - sbd / nullif(nbd, 0e0))" +
        s" / nullif(sqrt(${seSql("a")} + ${seSql("b")}), 0e0), 4) + 0.0 AS t_welch",
      // (a+b)² and a², b² written as explicit products: pow() is a
      // libm-vs-JVM last-ulp hazard, x*x is a single shared IEEE op
      s"round((${seSql("a")} + ${seSql("b")}) * (${seSql("a")} + ${seSql("b")})" +
        s" / nullif((${seSql("a")}) * (${seSql("a")}) / nullif(nad - 1e0, 0e0)" +
        s" + (${seSql("b")}) * (${seSql("b")}) / nullif(nbd - 1e0, 0e0), 0e0), 4)" +
        " + 0.0 AS df_welch")
  }

  /** q96: does order value differ between fulfilled ('F') and open
    * ('O') orders, within each order priority? */
  def orderTTest(spark: SparkSession, dir: String): DataFrame =
    welchTTest(Tables.orders(spark, dir),
      "o_orderpriority", "o_orderstatus", "F", "O", "o_totalprice")

  val orderTTestSql: String = {
    val terms = (sideTerms("a", "F") ++ sideTerms("b", "O"))
      .map { case (n, t) => s"$t AS $n" }.mkString(",\n    ")
    val recov = Seq("a", "b").flatMap(s => Seq(
      s"CAST(n_$s AS DOUBLE) AS n${s}d",
      s"CAST(s_$s AS DOUBLE) AS s${s}d",
      s"CAST(q_$s AS DOUBLE) AS q${s}d")).mkString(", ")
    s"""WITH prep AS (
       |  SELECT o_orderpriority AS g, o_orderstatus AS cls,
       |    floor(o_totalprice * 1e2) AS v
       |  FROM orders
       |  WHERE o_orderstatus IN ('F', 'O') AND o_totalprice IS NOT NULL),
       |agg AS (
       |  SELECT g,
       |    $terms
       |  FROM prep GROUP BY g),
       |recovered AS (
       |  SELECT g, n_a, n_b, $recov FROM agg)
       |SELECT g AS o_orderpriority, n_a, n_b,
       |  round(sad / nullif(nad, 0e0) / 1e2, 4) + 0.0 AS mean_a,
       |  round(sbd / nullif(nbd, 0e0) / 1e2, 4) + 0.0 AS mean_b,
       |  round((sad / nullif(nad, 0e0) - sbd / nullif(nbd, 0e0))
       |    / nullif(sqrt(${seSql("a")} + ${seSql("b")}), 0e0), 4) + 0.0 AS t_welch,
       |  round((${seSql("a")} + ${seSql("b")}) * (${seSql("a")} + ${seSql("b")})
       |    / nullif((${seSql("a")}) * (${seSql("a")}) / nullif(nad - 1e0, 0e0)
       |    + (${seSql("b")}) * (${seSql("b")}) / nullif(nbd - 1e0, 0e0), 0e0), 4)
       |  + 0.0 AS df_welch
       |FROM recovered""".stripMargin
  }

  // ------------------------------------------------------- Mann–Whitney U

  /** Shared z chain: U − n₁n₂/2 over the tie-corrected σ. All inputs
    * (u2 = 2·U₁, counts, Σ(t³−t)) are exact BIGINTs. */
  private val MwuSql: Seq[String] = {
    val nd1 = "CAST(n_x AS DOUBLE)"
    val nd2 = "CAST(n_y AS DOUBLE)"
    val nn = s"($nd1 + $nd2)"
    val u1 = "CAST(u2 AS DOUBLE) / 2e0"
    val sig2 = s"$nd1 * $nd2 / 12e0 * (($nn + 1e0)" +
      s" - CAST(ties AS DOUBLE) / nullif($nn * ($nn - 1e0), 0e0))"
    Seq(
      s"round($u1, 4) + 0.0 AS u_stat",
      s"round(($u1 - $nd1 * $nd2 / 2e0)" +
        s" / nullif(sqrt(greatest($sig2, 0e0)), 0e0), 4) + 0.0 AS z_u")
  }

  /** Mann–Whitney U of `valueCol` between `clsX` and `clsY` rows of
    * `classCol`, per `groupCol`, with tie-averaged ranks and the
    * tie-corrected normal approximation. Returns one row per group
    * that has at least one sampled row:
    * (group, n_x, n_y, u_stat, z_u) — U is the X-side statistic.
    *
    * Rank discipline (the q68 Spearman technique): ranks are carried
    * as the INTEGER 2·avgRank = 2·cumex + cnt + 1 computed on the
    * VALUE-LEVEL count table, so the window is bounded by value
    * cardinality, never row count — quantize continuous measures
    * first (q47) at 100 TB. 2·U₁ = Σ(cx·2r̄) − n₁(n₁+1) stays an exact
    * BIGINT; ties enter via Σ(t³−t) per distinct value. Row data never
    * meets the window: rank sums come from the cell counts directly,
    * so the plan is two cardinality-bounded aggregates + one window
    * over cells. */
  /** Value-level two-sample cell table (g, v, cx, cy): per (group,
    * distinct value), how many X- and Y-class rows — the shared
    * backbone of the rank (q97) and ECDF (q99) tests. ONE map-side-
    * combined aggregate; everything after it is bounded by value
    * cardinality, not row count. */
  private def sampleCells(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame =
    df
      .filter(col(classCol).isin(clsX, clsY) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(classCol).as("cls"),
        col(valueCol).as("v"))
      .groupBy("g", "v")
      .agg(
        expr(s"CAST(sum(CASE WHEN cls = '$clsX' THEN 1 ELSE 0 END) AS BIGINT)").as("cx"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsY' THEN 1 ELSE 0 END) AS BIGINT)").as("cy"))

  def mannWhitneyU(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame = {
    val cells = sampleCells(df, groupCol, classCol, clsX, clsY, valueCol)
      .withColumn("cnt", expr("cx + cy"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("cumex", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("r2", expr("2 * cumex + cnt + 1"))
    ranked.groupBy("g")
      .agg(
        expr("CAST(sum(cx) AS BIGINT)").as("n_x"),
        expr("CAST(sum(cy) AS BIGINT)").as("n_y"),
        expr("CAST(sum(cx * r2) AS BIGINT)").as("rx2"),
        expr("CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT)").as("ties"))
      .withColumn("u2", expr("rx2 - n_x * (n_x + 1)"))
      .selectExpr(Seq(s"g AS $groupCol", "n_x", "n_y") ++ MwuSql: _*)
  }

  /** q97: is returned ('R') line quantity distributed differently from
    * accepted ('A'), per ship year? */
  def lineitemMwu(spark: SparkSession, dir: String): DataFrame =
    mannWhitneyU(
      Tables.lineitem(spark, dir).withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_returnflag", "R", "A", "l_quantity")

  val lineitemMwuSql: String =
    s"""WITH cells AS (
       |  SELECT g, v,
       |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cy
       |  FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS g,
       |          l_returnflag AS cls, l_quantity AS v
       |        FROM lineitem
       |        WHERE l_returnflag IN ('R', 'A') AND l_quantity IS NOT NULL)
       |  GROUP BY g, v),
       |ranked AS (
       |  SELECT g, cx, cy, cx + cy AS cnt,
       |    2 * coalesce(sum(cx + cy) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    + (cx + cy) + 1 AS r2
       |  FROM cells),
       |agg AS (
       |  SELECT g,
       |    CAST(sum(cx) AS BIGINT) AS n_x,
       |    CAST(sum(cy) AS BIGINT) AS n_y,
       |    CAST(sum(cx * r2) AS BIGINT) AS rx2,
       |    CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
       |  FROM ranked GROUP BY g),
       |stats AS (
       |  SELECT g, n_x, n_y, rx2 - n_x * (n_x + 1) AS u2, ties FROM agg)
       |SELECT g AS ship_yr, n_x, n_y,
       |  ${MwuSql.mkString(",\n  ")}
       |FROM stats""".stripMargin

  // ----------------------------------------------------------- one-way ANOVA

  /** Shared F/η² chain over recovered exact sums. b = Σ_g ⌊(Σx)²/n⌋
    * snapped PER GROUP (so the cross-group sum is integer-exact and
    * order-free — the q91 micro-sum move, at 1-unit² resolution). */
  private val AnovaSql: Seq[String] = {
    val ssb = "greatest(bd - sd * sd / nullif(nd, 0e0), 0e0)"
    val ssw = "greatest(qd - bd, 0e0)"
    Seq(
      "round(sd / nullif(nd, 0e0), 4) + 0.0 AS grand_mean",
      s"round(($ssb / nullif(kd - 1e0, 0e0))" +
        s" / nullif($ssw / nullif(nd - kd, 0e0), 0e0), 4) + 0.0 AS f_stat",
      s"round($ssb / nullif($ssb + $ssw, 0e0), 6) + 0.0 AS eta_sq")
  }

  /** One-way ANOVA of `valueCol` across the levels of `factorCol`:
    * one row (k_groups, n_rows, grand_mean, f_stat, eta_sq).
    * `scale` = 1e0 snaps to whole units — keeping every per-group
    * ⌊(Σx)²/n⌋ term under 2^53 so the BIGINT it becomes is exact on
    * both engines (cents would push (Σx)² past double integer range).
    *
    * Plan: one map-side-combined aggregate to k group rows, then a
    * second k-row aggregate — nothing row-bounded after the scan. */
  def anovaF(df: DataFrame, factorCol: String, valueCol: String): DataFrame = {
    val grp = df
      .filter(col(factorCol).isNotNull && col(valueCol).isNotNull)
      .select(col(factorCol).as("g"), expr(s"floor($valueCol * 1e0)").as("v"))
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_g"),
        expr("CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("s_g"),
        expr("CAST(sum(CAST(floor(v * v) AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("q_g"))
      .withColumn("b_g", expr(
        "CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)" +
          " / nullif(CAST(n_g AS DOUBLE), 0e0)) AS DECIMAL(38,0))"))
    grp.agg(
      expr("CAST(count(1) AS BIGINT)").as("k_groups"),
      expr("CAST(sum(n_g) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(s_g) AS DECIMAL(38,0))").as("s_all"),
      expr("CAST(sum(q_g) AS DECIMAL(38,0))").as("q_all"),
      expr("CAST(sum(b_g) AS DECIMAL(38,0))").as("b_all"))
      .selectExpr(Seq("k_groups", "n_rows",
        "CAST(n_rows AS DOUBLE) AS nd", "CAST(k_groups AS DOUBLE) AS kd",
        "CAST(s_all AS DOUBLE) AS sd", "CAST(q_all AS DOUBLE) AS qd",
        "CAST(b_all AS DOUBLE) AS bd"): _*)
      .selectExpr(Seq("k_groups", "n_rows") ++ AnovaSql: _*)
  }

  /** q98: does order value vary across the five order priorities? */
  def orderAnova(spark: SparkSession, dir: String): DataFrame =
    anovaF(Tables.orders(spark, dir), "o_orderpriority", "o_totalprice")

  val orderAnovaSql: String =
    s"""WITH grp AS (
       |  SELECT g,
       |    CAST(count(1) AS BIGINT) AS n_g,
       |    CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_g,
       |    CAST(sum(CAST(floor(v * v) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q_g
       |  FROM (SELECT o_orderpriority AS g, floor(o_totalprice * 1e0) AS v
       |        FROM orders
       |        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL)
       |  GROUP BY g),
       |grp2 AS (
       |  SELECT grp.*,
       |    CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
       |      / nullif(CAST(n_g AS DOUBLE), 0e0)) AS DECIMAL(38,0)) AS b_g
       |  FROM grp),
       |tot AS (
       |  SELECT
       |    CAST(count(1) AS BIGINT) AS k_groups,
       |    CAST(sum(n_g) AS BIGINT) AS n_rows,
       |    CAST(sum(s_g) AS DECIMAL(38,0)) AS s_all,
       |    CAST(sum(q_g) AS DECIMAL(38,0)) AS q_all,
       |    CAST(sum(b_g) AS DECIMAL(38,0)) AS b_all
       |  FROM grp2),
       |recovered AS (
       |  SELECT k_groups, n_rows,
       |    CAST(n_rows AS DOUBLE) AS nd, CAST(k_groups AS DOUBLE) AS kd,
       |    CAST(s_all AS DOUBLE) AS sd, CAST(q_all AS DOUBLE) AS qd,
       |    CAST(b_all AS DOUBLE) AS bd
       |  FROM tot)
       |SELECT k_groups, n_rows,
       |  ${AnovaSql.mkString(",\n  ")}
       |FROM recovered""".stripMargin

  // ------------------------------------------------- Kolmogorov–Smirnov

  /** Shared D / z chain over the exact integer numerator:
    * D = max|c1·n2 − c2·n1| / (n1·n2) keeps the ECDF difference an
    * exact BIGINT until the single final division. `private[graft]`
    * so the q345 drift-stream oracle reuses the text verbatim (one
    * maintained formula, the q99 discipline). */
  private[graft] val KsSql: Seq[String] = {
    val n1d = "CAST(n_x AS DOUBLE)"
    val n2d = "CAST(n_y AS DOUBLE)"
    val d = s"CAST(dnum AS DOUBLE) / nullif($n1d * $n2d, 0e0)"
    Seq(
      s"round($d, 6) + 0.0 AS d_stat",
      s"round($d * sqrt($n1d * $n2d / nullif($n1d + $n2d, 0e0)), 4) + 0.0 AS ks_z")
  }

  /** Two-sample Kolmogorov–Smirnov test of `valueCol` between `clsX`
    * and `clsY` rows per `groupCol`: D = max |F̂x − F̂y| over the
    * pooled support, plus the asymptotic z = D·√(n₁n₂/(n₁+n₂)).
    * Returns (group, n_x, n_y, d_stat, ks_z); an empty side → NULL.
    *
    * Exactness: the supremum runs over the integer numerators
    * |c1·n2 − c2·n1| (cumulative counts cross-multiplied — exact
    * BIGINTs, max is order-free), so engines agree bit-for-bit before
    * the one division. Precondition: n₁·n₂ < 2^63 per group (any
    * per-group sample that fits a test fits this).
    *
    * Plan: the [[sampleCells]] aggregate, one cumulative window over
    * cells (bounded by value cardinality — quantize continuous columns
    * first, q47, at 100 TB), one group aggregate. */
  def ksTest(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame = {
    val cum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("g")
    sampleCells(df, groupCol, classCol, clsX, clsY, valueCol)
      .withColumn("c1", sum("cx").over(cum))
      .withColumn("c2", sum("cy").over(cum))
      .withColumn("n1", sum("cx").over(all))
      .withColumn("n2", sum("cy").over(all))
      .groupBy("g")
      .agg(
        expr("CAST(max(n1) AS BIGINT)").as("n_x"),
        expr("CAST(max(n2) AS BIGINT)").as("n_y"),
        expr("CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT)").as("dnum"))
      .selectExpr(Seq(s"g AS $groupCol", "n_x", "n_y") ++ KsSql: _*)
  }

  /** q99: returned vs accepted line quantity, distribution-level, per
    * ship year — the ECDF companion of q97's rank test. */
  def lineitemKs(spark: SparkSession, dir: String): DataFrame =
    ksTest(
      Tables.lineitem(spark, dir).withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_returnflag", "R", "A", "l_quantity")

  val lineitemKsSql: String =
    s"""WITH cells AS (
       |  SELECT g, v,
       |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cy
       |  FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS g,
       |          l_returnflag AS cls, l_quantity AS v
       |        FROM lineitem
       |        WHERE l_returnflag IN ('R', 'A') AND l_quantity IS NOT NULL)
       |  GROUP BY g, v),
       |cum AS (
       |  SELECT g,
       |    sum(cx) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
       |    sum(cy) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
       |    sum(cx) OVER (PARTITION BY g) AS n1,
       |    sum(cy) OVER (PARTITION BY g) AS n2
       |  FROM cells),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n1) AS BIGINT) AS n_x,
       |    CAST(max(n2) AS BIGINT) AS n_y,
       |    CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS dnum
       |  FROM cum GROUP BY g)
       |SELECT g AS ship_yr, n_x, n_y,
       |  ${KsSql.mkString(",\n  ")}
       |FROM agg""".stripMargin

  // --------------------------------------------- Jensen–Shannon divergence

  /** Per-cell micro-terms of the two KL halves. The ln argument
    * 2·t1/(t1+t2) is built from EXACT integer cross-products
    * t1 = cx·n2, t2 = cy·n1 (decimal-first — exact past 2^31-row
    * sides) recovered as doubles; the ln output is snapped to a 1e-9
    * grid (engine ln can differ in the last ulp — the q94 exp
    * discipline), the weighted term floored to an exact integer
    * micro-unit (the q91 micro-sum move), and ONLY integers are
    * summed — order-free on both engines. A zero cell contributes 0
    * (the 0·ln 0 = 0 KL convention) via the CASE guard. */
  private def jsTermSql(c: String, tNum: String): String = {
    val ratio = s"2e0 * ${tNum}d / nullif(t1d + t2d, 0e0)"
    val lnS = s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
    s"CASE WHEN $c > 0 THEN CAST(floor(CAST($c AS DOUBLE) * ($lnS) * 1e9)" +
      s" AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END"
  }

  /** Shared final chain: JS = Σx/(2n₁) + Σy/(2n₂), in nats, de-scaled
    * from micro-units; clamped at 0 (an all-equal pair of samples sums
    * to exactly 0, but micro-flooring can leave it a hair negative).
    * The clamp is a CASE, NOT greatest(): both engines' greatest()
    * ignores NULLs, which would silently turn the empty-side NULL
    * convention into 0. */
  private val JsSql: Seq[String] = {
    val raw = "CAST(sx AS DOUBLE) / nullif(2e0 * CAST(n_x AS DOUBLE), 0e0)" +
      " + CAST(sy AS DOUBLE) / nullif(2e0 * CAST(n_y AS DOUBLE), 0e0)"
    Seq(s"round((CASE WHEN ($raw) < 0e0 THEN 0e0 ELSE ($raw) END) / 1e9, 6)" +
      " + 0.0 AS js_div")
  }

  /** Jensen–Shannon divergence (nats, ∈ [0, ln 2]) of `valueCol`
    * between `clsX` and `clsY` rows per `groupCol` — the symmetric,
    * always-finite distribution distance: JS = ½KL(P‖M) + ½KL(Q‖M),
    * M = (P+Q)/2. Complements q99: KS sees the worst single ECDF gap,
    * JS integrates mass displacement everywhere (the standard corpus-
    * shift / language-drift measure for training-data monitoring).
    * Returns (group, n_x, n_y, js_div); an empty side → 0 vs itself
    * convention never arises (JS vs an empty sample is NULL via
    * nullif).
    *
    * Plan: the [[sampleCells]] aggregate + per-group side totals over
    * cells (cardinality-bounded windows) + one group aggregate —
    * scan-priced like its q97/q99 siblings. */
  def jsDivergence(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame = {
    val all = Window.partitionBy("g")
    sampleCells(df, groupCol, classCol, clsX, clsY, valueCol)
      .withColumn("n1", sum("cx").over(all))
      .withColumn("n2", sum("cy").over(all))
      .withColumn("t1d", expr("CAST(CAST(cx AS DECIMAL(38,0)) * n2 AS DOUBLE)"))
      .withColumn("t2d", expr("CAST(CAST(cy AS DECIMAL(38,0)) * n1 AS DOUBLE)"))
      .groupBy("g")
      .agg(
        expr("CAST(max(n1) AS BIGINT)").as("n_x"),
        expr("CAST(max(n2) AS BIGINT)").as("n_y"),
        expr(s"CAST(sum(${jsTermSql("cx", "t1")}) AS DECIMAL(38,0))").as("sx"),
        expr(s"CAST(sum(${jsTermSql("cy", "t2")}) AS DECIMAL(38,0))").as("sy"))
      .selectExpr(Seq(s"g AS $groupCol", "n_x", "n_y") ++ JsSql: _*)
  }

  /** q103: how far apart are returned vs accepted quantity
    * distributions, per ship year — the integrated-mass companion of
    * q99's supremum. */
  def lineitemJs(spark: SparkSession, dir: String): DataFrame =
    jsDivergence(
      Tables.lineitem(spark, dir).withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_returnflag", "R", "A", "l_quantity")

  val lineitemJsSql: String =
    s"""WITH cells AS (
       |  SELECT g, v,
       |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cy
       |  FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS g,
       |          l_returnflag AS cls, l_quantity AS v
       |        FROM lineitem
       |        WHERE l_returnflag IN ('R', 'A') AND l_quantity IS NOT NULL)
       |  GROUP BY g, v),
       |sided AS (
       |  SELECT g, cx, cy,
       |    sum(cx) OVER (PARTITION BY g) AS n1,
       |    sum(cy) OVER (PARTITION BY g) AS n2
       |  FROM cells),
       |crossed AS (
       |  SELECT g, cx, cy, n1, n2,
       |    CAST(CAST(cx AS HUGEINT) * n2 AS DOUBLE) AS t1d,
       |    CAST(CAST(cy AS HUGEINT) * n1 AS DOUBLE) AS t2d
       |  FROM sided),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n1) AS BIGINT) AS n_x,
       |    CAST(max(n2) AS BIGINT) AS n_y,
       |    CAST(sum(${jsTermSql("cx", "t1")}) AS DECIMAL(38,0)) AS sx,
       |    CAST(sum(${jsTermSql("cy", "t2")}) AS DECIMAL(38,0)) AS sy
       |  FROM crossed GROUP BY g)
       |SELECT g AS ship_yr, n_x, n_y,
       |  ${JsSql.mkString(",\n  ")}
       |FROM agg""".stripMargin

  // --------------------------------------------- Benjamini–Hochberg FDR

  /** Two-sided normal p from a z statistic: p = erfc(|z|/√2) via
    * Abramowitz–Stegun 7.1.26 (|err| ≤ 1.5e-7, below the round-6
    * output grid) — the q94 shared-text chain; the input z is already
    * round-4 snapped, so both engines start from the identical double. */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Benjamini–Hochberg step-up q-values for a table of tests keyed by
    * `keyCol` with a round-4-snapped z statistic in `zCol`:
    * q_i = min_{j ≥ i}(p_j · m / j), clamped to 1 — the standard FDR
    * control over a family of tests. NULL-z tests (degenerate groups)
    * are excluded and do not count toward m. Returns
    * (key, z, p_norm, rank_p, p_bh).
    *
    * The two windows are GLOBAL (rank over all tests, running min from
    * the largest p down) — legitimate single-partition work because a
    * test FAMILY is dimension-grade by construction (one row per
    * hypothesis, not per observation); the observation-scale work
    * happened upstream in whatever produced the z column. Determinism:
    * p is bit-equal cross-engine (shared chain from a snapped input),
    * ties broken by key. */
  def bhAdjust(tests: DataFrame, keyCol: String, zCol: String): DataFrame = {
    val withP = tests
      .filter(col(zCol).isNotNull)
      .withColumn("p_raw", expr(pSql(zCol)))
    val m = Window.partitionBy()
    val byP = Window.orderBy(col("p_raw"), col(keyCol))
    val fromLargest = Window.orderBy(col("p_raw").desc, col(keyCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withP
      .withColumn("m_tests", count(lit(1)).over(m))
      .withColumn("rank_p", row_number().over(byP).cast("long"))
      .withColumn("bh_raw", expr(
        "p_raw * CAST(m_tests AS DOUBLE) / CAST(rank_p AS DOUBLE)"))
      .withColumn("p_bh_min", min("bh_raw").over(fromLargest))
      .selectExpr(keyCol, zCol,
        "round(p_raw, 6) + 0.0 AS p_norm",
        "rank_p",
        "round(least(p_bh_min, 1e0), 6) + 0.0 AS p_bh")
  }

  /** Benjamini–Yekutieli adjustment — BH's [[bhAdjust]] chain times the
    * harmonic constant c(m) = Σ_{i≤m} 1/i, the correction that keeps
    * FDR control under ARBITRARY dependence (BH assumes independence
    * or PRDS; per-segment test families over the same fact table are
    * exactly the correlated case BY exists for). c(m) rides an exact
    * 1e-15 fixed-point integer sum over the rank column (rank_p
    * enumerates 1..m, so Σ 1/rank over the window IS c(m)) — an
    * order-independent BIGINT both engines reproduce bit-for-bit,
    * where a double fold would flake on addition order. */
  def byAdjust(tests: DataFrame, keyCol: String, zCol: String): DataFrame = {
    val withP = tests
      .filter(col(zCol).isNotNull)
      .withColumn("p_raw", expr(pSql(zCol)))
    val m = Window.partitionBy()
    val byP = Window.orderBy(col("p_raw"), col(keyCol))
    val fromLargest = Window.orderBy(col("p_raw").desc, col(keyCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withP
      .withColumn("m_tests", count(lit(1)).over(m))
      .withColumn("rank_p", row_number().over(byP).cast("long"))
      .withColumn("cm_fixed", sum(expr(
        "CAST(round(1e15 / CAST(rank_p AS DOUBLE)) AS BIGINT)")).over(m))
      .withColumn("by_raw", expr(
        "p_raw * CAST(m_tests AS DOUBLE) * (CAST(cm_fixed AS DOUBLE) / 1e15)" +
          " / CAST(rank_p AS DOUBLE)"))
      .withColumn("p_by_min", min("by_raw").over(fromLargest))
      .selectExpr(keyCol, zCol,
        "round(p_raw, 6) + 0.0 AS p_norm",
        "rank_p",
        "round(least(p_by_min, 1e0), 6) + 0.0 AS p_by")
  }

  /** q329: the q100 family under BY — same seven yearly Mann–Whitney
    * tests, the dependence-robust adjustment beside the BH one. */
  def mwuBy(spark: SparkSession, dir: String): DataFrame =
    byAdjust(lineitemMwu(spark, dir), "ship_yr", "z_u")

  val mwuBySql: String = {
    val byRaw = "p_raw * CAST(m_tests AS DOUBLE)" +
      " * (CAST(cm_fixed AS DOUBLE) / 1e15) / CAST(rank_p AS DOUBLE)"
    s"""WITH mwu AS (
       |${lineitemMwuSql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |withp AS (
       |  SELECT ship_yr, z_u, ${pSql("z_u")} AS p_raw
       |  FROM mwu WHERE z_u IS NOT NULL),
       |ranked AS (
       |  SELECT ship_yr, z_u, p_raw,
       |    CAST(count(*) OVER () AS BIGINT) AS m_tests,
       |    CAST(row_number() OVER (ORDER BY p_raw, ship_yr) AS BIGINT) AS rank_p
       |  FROM withp),
       |harm AS (
       |  SELECT ranked.*,
       |    CAST(sum(CAST(round(1e15 / CAST(rank_p AS DOUBLE)) AS BIGINT))
       |      OVER () AS BIGINT) AS cm_fixed
       |  FROM ranked),
       |mins AS (
       |  SELECT harm.*,
       |    min($byRaw) OVER (ORDER BY p_raw DESC, ship_yr DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_by_min
       |  FROM harm)
       |SELECT ship_yr, z_u,
       |  round(p_raw, 6) + 0.0 AS p_norm,
       |  rank_p,
       |  round(least(p_by_min, 1e0), 6) + 0.0 AS p_by
       |FROM mins""".stripMargin
  }

  /** q100: FDR-corrected per-year Mann–Whitney family — q97's seven
    * yearly tests adjusted together (the multiple-comparisons step any
    * per-segment scan of 10⁴ segments needs before reading its
    * "significant" list). */
  def mwuBh(spark: SparkSession, dir: String): DataFrame =
    bhAdjust(lineitemMwu(spark, dir), "ship_yr", "z_u")

  val mwuBhSql: String = {
    val bhRaw = "p_raw * CAST(m_tests AS DOUBLE) / CAST(rank_p AS DOUBLE)"
    s"""WITH mwu AS (
       |${lineitemMwuSql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |withp AS (
       |  SELECT ship_yr, z_u, ${pSql("z_u")} AS p_raw
       |  FROM mwu WHERE z_u IS NOT NULL),
       |ranked AS (
       |  SELECT ship_yr, z_u, p_raw,
       |    CAST(count(*) OVER () AS BIGINT) AS m_tests,
       |    CAST(row_number() OVER (ORDER BY p_raw, ship_yr) AS BIGINT) AS rank_p
       |  FROM withp),
       |mins AS (
       |  SELECT ranked.*,
       |    min($bhRaw) OVER (ORDER BY p_raw DESC, ship_yr DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_bh_min
       |  FROM ranked)
       |SELECT ship_yr, z_u,
       |  round(p_raw, 6) + 0.0 AS p_norm,
       |  rank_p,
       |  round(least(p_bh_min, 1e0), 6) + 0.0 AS p_bh
       |FROM mins""".stripMargin
  }
}
