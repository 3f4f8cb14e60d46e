package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Correlation matrix — Pearson r and tie-corrected Spearman ρ for
  * every pair of measures, in ONE aggregate pass over the fact table.
  * The reference computes exactly this kind of bivariate association
  * for its analysis layer (`run_analysis.Rmd` regression/EDA); here it
  * is the engine-level operator with the q32 exactness contract:
  * order-dependent double sums never cross an engine boundary.
  *
  * Exactness: every per-row term (value, value², cross product — and
  * the same over ranks) is snapped to an integer via a SHARED
  * `floor(expr)` text and summed as DECIMAL(38,0) — exact and
  * order-free on both engines — then the classic
  * (n·Σab − Σa·Σb) / (√(n·Σaa − Σa²)·√(n·Σbb − Σb²)) formula runs as
  * shared SQL text on the recovered doubles, so every FP operation has
  * identical operand order. Values are pre-scaled by 1e4 (exact-cents
  * trick), keeping all products exactly representable (≤ 5e8).
  *
  * Spearman = Pearson over tie-averaged ranks, which with ties is the
  * textbook tie-corrected ρ. Ranks are carried as 2·avgRank =
  * 2·cumex + cnt + 1 (integer, no halves) — a constant affine change
  * that cancels in ρ. The rank map is built per column from the
  * VALUE-LEVEL count aggregate: its window runs over distinct values,
  * so it is bounded by value cardinality (the registered columns have
  * ≤ 50 distinct values), not row count, and the corpus picks ranks up
  * via broadcast equi-joins — quantize continuous columns first (q47's
  * binning) before asking for rank statistics at 100 TB.
  *
  * Plan: 3 broadcast joins (each against a ≤-cardinality rank map) +
  * ONE map-side-combined aggregate producing 19 exact sums; the 1-row
  * result is localCheckpointed and fanned out into the 3 matrix rows,
  * so the fact table is scanned once.
  */
object Correlation {

  /** Fixed-point pre-scale for raw values (exact at 4 decimals). */
  val ValScale = 10000L

  private val VarNames = Seq("q" -> "quantity", "d" -> "discount", "t" -> "tax")
  private val SrcCols = Map("q" -> "l_quantity", "d" -> "l_discount", "t" -> "l_tax")
  private val VarPairs = Seq(("q", "d"), ("q", "t"), ("d", "t"))

  /** Snapped/rank column names: vq vd vt rq rd rt. */
  private val Cols = VarNames.map("v" + _._1) ++ VarNames.map("r" + _._1)

  /** (sum-name, per-row double expr) — shared between engines. */
  private val TermExprs: Seq[(String, String)] =
    Cols.map(c => (s"s_$c", c)) ++
      Cols.map(c => (s"s_${c}_$c", s"$c * $c")) ++
      VarPairs.flatMap { case (a, b) =>
        Seq((s"s_v${a}_v$b", s"v$a * v$b"), (s"s_r${a}_r$b", s"r$a * r$b"))
      }

  /** Shared ρ text over recovered double sums (round-4, −0.0-proofed).
    * nullif: a zero-variance column has no defined correlation — NULL,
    * not an ANSI divide-by-zero (integer-snapped sums make the zero
    * EXACT, so this is reachable, unlike float-noise variances). */
  private def rhoSql(sa: String, sb: String, sab: String,
      saa: String, sbb: String): String =
    s"round((nd * $sab - $sa * $sb) / " +
      s"nullif(sqrt(nd * $saa - $sa * $sa) * sqrt(nd * $sbb - $sb * $sb), 0.0), 4) + 0.0"

  /** 2·avgRank per distinct value of `src` (integer; window over the
    * value-level aggregate — cardinality-bounded, never row-bounded). */
  private def rankMap(fact: DataFrame, src: String): DataFrame = {
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fact.groupBy(col(src).as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cumex", coalesce(sum("cnt").over(w), lit(0L)))
      .select(col("v"), (lit(2L) * col("cumex") + col("cnt") + 1L)
        .cast("double").as("r2"))
  }

  /** q68: (var_a, var_b, n_rows, pearson_r, spearman_rho) for each of
    * the three measure pairs. */
  def corrMatrix(fact: DataFrame): DataFrame = {
    val prep0 = fact.select(SrcCols.values.toSeq.map(col): _*)
    val prep = VarNames.foldLeft(prep0) { case (df, (v, _)) =>
      df.join(broadcast(rankMap(fact, SrcCols(v))
          .withColumnRenamed("v", s"_v$v").withColumnRenamed("r2", s"r$v")),
        col(SrcCols(v)) === col(s"_v$v"))
    }.select(
      VarNames.map { case (v, _) =>
        expr(s"floor(${SrcCols(v)} * $ValScale.0)").as(s"v$v")
      } ++ VarNames.map { case (v, _) => col(s"r$v") }: _*)
    val stats = prep.agg(
      count(lit(1)).as("n_rows"),
      TermExprs.map { case (n, t) =>
        expr(s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0))").as(n)
      }: _*)
      .localCheckpoint(true) // 1 row; fan out 3 matrix rows, scan once
    val recovered = stats.select(
      col("n_rows") +: expr("CAST(n_rows AS DOUBLE)").as("nd") +:
        TermExprs.map { case (n, _) => expr(s"CAST($n AS DOUBLE)").as(n) }: _*)
    val rows = VarPairs.map { case (a, b) =>
      recovered.selectExpr(
        s"'${VarNames.toMap.apply(a)}' AS var_a",
        s"'${VarNames.toMap.apply(b)}' AS var_b",
        "n_rows",
        s"${rhoSql(s"s_v$a", s"s_v$b", s"s_v${a}_v$b", s"s_v${a}_v$a", s"s_v${b}_v$b")} AS pearson_r",
        s"${rhoSql(s"s_r$a", s"s_r$b", s"s_r${a}_r$b", s"s_r${a}_r$a", s"s_r${b}_r$b")} AS spearman_rho")
    }
    rows.reduce(_ unionByName _)
  }

  def corrMatrix(spark: SparkSession, dir: String): DataFrame =
    corrMatrix(Tables.lineitem(spark, dir))

  // ------------------------------------------------------ partial correlation

  /** Raw (unrounded) ρ text — the same chain as [[rhoSql]] without the
    * display round, for use INSIDE further shared-text arithmetic. */
  private def rhoRawSql(sa: String, sb: String, sab: String,
      saa: String, sbb: String): String =
    s"((nd * $sab - $sa * $sb) / " +
      s"nullif(sqrt(nd * $saa - $sa * $sa) * sqrt(nd * $sbb - $sb * $sb), 0.0))"

  /** q106: first-order partial correlations — for each measure pair,
    * the Pearson correlation CONTROLLING for the third measure:
    * r_ab·c = (r_ab − r_ac·r_bc) / √((1 − r_ac²)(1 − r_bc²)).
    * The "is the association real or routed through z?" answer that
    * raw correlation can't give (the reference's regression adjusts
    * for covariates for exactly this reason — this is the
    * correlation-matrix view of the same adjustment).
    *
    * Cost: ZERO new passes — the same 19 exact fixed-point sums from
    * [[corrMatrix]]'s single aggregate, fanned out through a longer
    * shared-text chain (raw unrounded ρ's composed then rounded once
    * at the end, identical text both engines). NULL propagation: a
    * zero-variance variable NULLs its raw ρ (the q68 rule) and hence
    * every partial r touching it; an EXACTLY-singular partialled
    * variance hits the nullif. A merely near-singular control
    * (|ρ| → 1 up to fp) amplifies noise instead — the standard
    * partial-correlation conditioning hazard, the caller's statistics
    * problem, not an engine artifact. */
  def partialCorr(fact: DataFrame): DataFrame = {
    val prep0 = fact.select(SrcCols.values.toSeq.map(col): _*)
    val prep = VarNames.foldLeft(prep0) { case (df, (v, _)) =>
      df.join(broadcast(rankMap(fact, SrcCols(v))
          .withColumnRenamed("v", s"_v$v").withColumnRenamed("r2", s"r$v")),
        col(SrcCols(v)) === col(s"_v$v"))
    }.select(
      VarNames.map { case (v, _) =>
        expr(s"floor(${SrcCols(v)} * $ValScale.0)").as(s"v$v")
      } ++ VarNames.map { case (v, _) => col(s"r$v") }: _*)
    val stats = prep.agg(
      count(lit(1)).as("n_rows"),
      TermExprs.map { case (n, t) =>
        expr(s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0))").as(n)
      }: _*)
      .localCheckpoint(true)
    val recovered = stats.select(
      col("n_rows") +: expr("CAST(n_rows AS DOUBLE)").as("nd") +:
        TermExprs.map { case (n, _) => expr(s"CAST($n AS DOUBLE)").as(n) }: _*)
    val rows = VarPairs.map { case (a, b) =>
      val c = Seq("q", "d", "t").filterNot(v => v == a || v == b).head
      def rho(x: String, y: String) = {
        val (p, q) = if (Seq("q", "d", "t").indexOf(x) < Seq("q", "d", "t").indexOf(y))
          (x, y) else (y, x)
        rhoRawSql(s"s_v$p", s"s_v$q", s"s_v${p}_v$q", s"s_v${p}_v$p", s"s_v${q}_v$q")
      }
      val (rab, rac, rbc) = (rho(a, b), rho(a, c), rho(b, c))
      recovered.selectExpr(
        s"'${VarNames.toMap.apply(a)}' AS var_a",
        s"'${VarNames.toMap.apply(b)}' AS var_b",
        s"'${VarNames.toMap.apply(c)}' AS ctrl",
        "n_rows",
        s"round(($rab - $rac * $rbc) /" +
          s" nullif(sqrt((1e0 - $rac * $rac) * (1e0 - $rbc * $rbc)), 0e0), 4)" +
          " + 0.0 AS partial_r")
    }
    rows.reduce(_ unionByName _)
  }

  def partialCorr(spark: SparkSession, dir: String): DataFrame =
    partialCorr(Tables.lineitem(spark, dir))

  /** DuckDB twin: q68's CTE chain with the partial-r fan-out. */
  val partialCorrSql: String = {
    val rankCtes = VarNames.map { case (v, _) =>
      s"""rm$v AS (
         |  SELECT v, CAST(2 * cumex + cnt + 1 AS DOUBLE) AS r$v FROM (
         |    SELECT v, cnt, coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumex
         |    FROM (SELECT ${SrcCols(v)} AS v, count(*) AS cnt
         |          FROM lineitem GROUP BY 1)))""".stripMargin
    }.mkString(",\n")
    val prepCols = (VarNames.map { case (v, _) =>
      s"floor(${SrcCols(v)} * $ValScale.0) AS v$v"
    } ++ VarNames.map { case (v, _) => s"rm$v.r$v AS r$v" }).mkString(", ")
    val joins = VarNames.map { case (v, _) =>
      s"JOIN rm$v ON ${SrcCols(v)} = rm$v.v"
    }.mkString(" ")
    val sums = TermExprs.map { case (n, t) =>
      s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS $n"
    }.mkString(",\n    ")
    val recov = TermExprs.map { case (n, _) => s"CAST($n AS DOUBLE) AS $n" }
      .mkString(", ")
    val rows = VarPairs.map { case (a, b) =>
      val c = Seq("q", "d", "t").filterNot(v => v == a || v == b).head
      def rho(x: String, y: String) = {
        val (p, q) = if (Seq("q", "d", "t").indexOf(x) < Seq("q", "d", "t").indexOf(y))
          (x, y) else (y, x)
        rhoRawSql(s"s_v$p", s"s_v$q", s"s_v${p}_v$q", s"s_v${p}_v$p", s"s_v${q}_v$q")
      }
      val (rab, rac, rbc) = (rho(a, b), rho(a, c), rho(b, c))
      s"""SELECT '${VarNames.toMap.apply(a)}' AS var_a,
         |  '${VarNames.toMap.apply(b)}' AS var_b,
         |  '${VarNames.toMap.apply(c)}' AS ctrl, n_rows,
         |  round(($rab - $rac * $rbc) /
         |    nullif(sqrt((1e0 - $rac * $rac) * (1e0 - $rbc * $rbc)), 0e0), 4)
         |  + 0.0 AS partial_r""".stripMargin + "\nFROM recovered"
    }.mkString("\nUNION ALL\n")
    s"""WITH
       |$rankCtes,
       |prep AS (
       |  SELECT $prepCols FROM lineitem $joins),
       |stats AS (
       |  SELECT count(*) AS n_rows,
       |    $sums
       |  FROM prep),
       |recovered AS (
       |  SELECT n_rows, CAST(n_rows AS DOUBLE) AS nd, $recov FROM stats)
       |$rows""".stripMargin
  }

  // ------------------------------------------------------- VIF (q267)

  /** Value-only sum set (no rank maps — VIF is a raw-variable
    * diagnostic): the 9 exact fixed-point sums the Pearson block of
    * [[TermExprs]] uses, same names so [[rhoRawSql]] applies
    * unchanged. */
  private val ValTermExprs: Seq[(String, String)] = {
    val vcols = VarNames.map("v" + _._1)
    vcols.map(c => (s"s_$c", c)) ++
      vcols.map(c => (s"s_${c}_$c", s"$c * $c")) ++
      VarPairs.map { case (a, b) => (s"s_v${a}_v$b", s"v$a * v$b") }
  }

  /** q267: variance-inflation factors — for each measure, how much
    * the OTHER two inflate its OLS coefficient variance:
    * VIF_a = 1/(1 − R_a²) with R_a² the R² of regressing a on (b, c);
    * for three variables R_a² is closed-form in the pairwise
    * correlations: (r_ab² + r_ac² − 2·r_ab·r_ac·r_bc)/(1 − r_bc²).
    * The multicollinearity check every multi-regressor fit in the
    * deck (q89/q94/q95) should read before trusting its SEs — q106
    * asks "is the association routed through z?", VIF asks "can the
    * solver even separate the regressors?".
    *
    * Cost: ONE map-side-combined aggregate producing 9 exact
    * fixed-point sums (the q68 value block without its rank maps —
    * no joins at all), fanned out through a longer shared-text chain.
    * NULL rules: a zero-variance variable NULLs its raw ρ and every
    * VIF touching it; exactly-collinear controls (r_bc² = 1) hit the
    * nullif; R² ≥ 1 up to fp (numerically collinear) returns NULL
    * vif rather than a negative artifact. */
  def vif(fact: DataFrame): DataFrame = {
    val prep = fact.select(VarNames.map { case (v, _) =>
      expr(s"floor(${SrcCols(v)} * $ValScale.0)").as(s"v$v")
    }: _*)
    val stats = prep.agg(
      count(lit(1)).as("n_rows"),
      ValTermExprs.map { case (n, t) =>
        expr(s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0))").as(n)
      }: _*)
      .localCheckpoint(true) // 1 row; fan out 3 VIF rows, scan once
    val recovered = stats.select(
      col("n_rows") +: expr("CAST(n_rows AS DOUBLE)").as("nd") +:
        ValTermExprs.map { case (n, _) => expr(s"CAST($n AS DOUBLE)").as(n) }: _*)
    val order = Seq("q", "d", "t")
    val rows = order.map { a =>
      val Seq(b, c) = order.filterNot(_ == a)
      def rho(x: String, y: String) = {
        val (p, q) = if (order.indexOf(x) < order.indexOf(y)) (x, y) else (y, x)
        rhoRawSql(s"s_v$p", s"s_v$q", s"s_v${p}_v$q", s"s_v${p}_v$p", s"s_v${q}_v$q")
      }
      val (rab, rac, rbc) = (rho(a, b), rho(a, c), rho(b, c))
      val r2 = s"(($rab * $rab + $rac * $rac - 2e0 * $rab * $rac * $rbc)" +
        s" / nullif(1e0 - $rbc * $rbc, 0e0))"
      recovered.selectExpr(
        s"'${VarNames.toMap.apply(a)}' AS variable",
        "n_rows",
        s"round($r2, 6) + 0.0 AS r2_others",
        s"CASE WHEN $r2 >= 0e0 AND $r2 < 1e0 THEN round(1e0 / (1e0 - $r2), 4) + 0.0 END AS vif")
    }
    rows.reduce(_ unionByName _)
  }

  def vif(spark: SparkSession, dir: String): DataFrame =
    vif(Tables.lineitem(spark, dir))

  /** DuckDB twin: identical snapped sums, identical shared ρ/R²/VIF
    * chain. */
  val vifSql: String = {
    val prepCols = VarNames.map { case (v, _) =>
      s"floor(${SrcCols(v)} * $ValScale.0) AS v$v"
    }.mkString(", ")
    val sums = ValTermExprs.map { case (n, t) =>
      s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS $n"
    }.mkString(",\n    ")
    val recov = ValTermExprs.map { case (n, _) => s"CAST($n AS DOUBLE) AS $n" }
      .mkString(", ")
    val order = Seq("q", "d", "t")
    val rows = order.map { a =>
      val Seq(b, c) = order.filterNot(_ == a)
      def rho(x: String, y: String) = {
        val (p, q) = if (order.indexOf(x) < order.indexOf(y)) (x, y) else (y, x)
        rhoRawSql(s"s_v$p", s"s_v$q", s"s_v${p}_v$q", s"s_v${p}_v$p", s"s_v${q}_v$q")
      }
      val (rab, rac, rbc) = (rho(a, b), rho(a, c), rho(b, c))
      val r2 = s"(($rab * $rab + $rac * $rac - 2e0 * $rab * $rac * $rbc)" +
        s" / nullif(1e0 - $rbc * $rbc, 0e0))"
      s"""SELECT '${VarNames.toMap.apply(a)}' AS variable, n_rows,
         |  round($r2, 6) + 0.0 AS r2_others,
         |  CASE WHEN $r2 >= 0e0 AND $r2 < 1e0 THEN round(1e0 / (1e0 - $r2), 4) + 0.0 END AS vif
         |FROM recovered""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH prep AS (
       |  SELECT $prepCols FROM lineitem),
       |stats AS (
       |  SELECT count(*) AS n_rows,
       |    $sums
       |  FROM prep),
       |recovered AS (
       |  SELECT n_rows, CAST(n_rows AS DOUBLE) AS nd, $recov FROM stats)
       |$rows""".stripMargin
  }

  // ------------------------------------------- Fisher z CI (q269)

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** z_{0.975}, pinned (the q94 CI literal). */
  private val ZCrit = "1.959963984540054"

  /** tanh via exp — exp is already relied on cross-engine by the A&S
    * erfc chain; one shared-text spelling. */
  private def tanhSql(x: String): String =
    s"((exp(2e0 * $x) - 1e0) / (exp(2e0 * $x) + 1e0))"

  /** q269: Fisher-z 95% confidence intervals for the three q68
    * Pearson correlations — the inference step the point estimate
    * lacks: atanh(r) is approximately normal with SE 1/√(n−3), so
    * CI = tanh(atanh(r) ± z·SE). Completes the correlation family the
    * way q158 completes q94's GLM: estimate → interval.
    *
    * Exactness: r is the round-4-snapped shared-text ρ (identical to
    * q68's displayed value), atanh's single ln rides the house 1e-9
    * snap, tanh is one shared exp spelling, and the interval
    * arithmetic is a fixed chain off those snapped doubles. Guards:
    * |r| = 1 (exact collinearity) hits the nullif inside atanh;
    * n ≤ 3 NULLs the SE; a zero-variance column NULLs r itself.
    *
    * Cost: the q267 shape — ONE 9-sum value aggregate, no rank maps,
    * fanned into 3 rows. */
  def corrCi(fact: DataFrame): DataFrame = {
    val prep = fact.select(VarNames.map { case (v, _) =>
      expr(s"floor(${SrcCols(v)} * $ValScale.0)").as(s"v$v")
    }: _*)
    val stats = prep.agg(
      count(lit(1)).as("n_rows"),
      ValTermExprs.map { case (n, t) =>
        expr(s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0))").as(n)
      }: _*)
      .localCheckpoint(true)
    val recovered = stats.select(
      col("n_rows") +: expr("CAST(n_rows AS DOUBLE)").as("nd") +:
        ValTermExprs.map { case (n, _) => expr(s"CAST($n AS DOUBLE)").as(n) }: _*)
    val rows = VarPairs.map { case (a, b) =>
      val r4 = s"round(${rhoRawSql(s"s_v$a", s"s_v$b", s"s_v${a}_v$b",
        s"s_v${a}_v$a", s"s_v${b}_v$b")}, 4)"
      recovered.selectExpr(
        s"'${VarNames.toMap.apply(a)}' AS var_a",
        s"'${VarNames.toMap.apply(b)}' AS var_b",
        "n_rows",
        s"$r4 + 0.0 AS pearson_r",
        s"(5e-1 * ${lnSnap(s"((1e0 + $r4) / nullif(1e0 - $r4, 0e0))")}) AS zr",
        s"CASE WHEN n_rows > 3 THEN 1e0 / sqrt(nd - 3e0) END AS se")
        .selectExpr("var_a", "var_b", "n_rows", "pearson_r",
          s"round(${tanhSql(s"(zr - $ZCrit * se)")}, 4) + 0.0 AS ci_lo",
          s"round(${tanhSql(s"(zr + $ZCrit * se)")}, 4) + 0.0 AS ci_hi")
    }
    rows.reduce(_ unionByName _)
  }

  def corrCi(spark: SparkSession, dir: String): DataFrame =
    corrCi(Tables.lineitem(spark, dir))

  /** DuckDB twin: identical snapped sums, identical atanh/tanh chain. */
  val corrCiSql: String = {
    val prepCols = VarNames.map { case (v, _) =>
      s"floor(${SrcCols(v)} * $ValScale.0) AS v$v"
    }.mkString(", ")
    val sums = ValTermExprs.map { case (n, t) =>
      s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS $n"
    }.mkString(",\n    ")
    val recov = ValTermExprs.map { case (n, _) => s"CAST($n AS DOUBLE) AS $n" }
      .mkString(", ")
    val rows = VarPairs.map { case (a, b) =>
      val r4 = s"round(${rhoRawSql(s"s_v$a", s"s_v$b", s"s_v${a}_v$b",
        s"s_v${a}_v$a", s"s_v${b}_v$b")}, 4)"
      s"""SELECT '${VarNames.toMap.apply(a)}' AS var_a,
         |  '${VarNames.toMap.apply(b)}' AS var_b, n_rows,
         |  $r4 + 0.0 AS pearson_r,
         |  (5e-1 * ${lnSnap(s"((1e0 + $r4) / nullif(1e0 - $r4, 0e0))")}) AS zr,
         |  CASE WHEN n_rows > 3 THEN 1e0 / sqrt(nd - 3e0) END AS se
         |FROM recovered""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH prep AS (
       |  SELECT $prepCols FROM lineitem),
       |stats AS (
       |  SELECT count(*) AS n_rows,
       |    $sums
       |  FROM prep),
       |recovered AS (
       |  SELECT n_rows, CAST(n_rows AS DOUBLE) AS nd, $recov FROM stats),
       |zrows AS (
       |$rows)
       |SELECT var_a, var_b, n_rows, pearson_r,
       |  round(${tanhSql(s"(zr - $ZCrit * se)")}, 4) + 0.0 AS ci_lo,
       |  round(${tanhSql(s"(zr + $ZCrit * se)")}, 4) + 0.0 AS ci_hi
       |FROM zrows""".stripMargin
  }

  // ------------------------------------------------------------ Kendall τ-b

  /** Shared τ-b / z text over recovered doubles. Inputs are exact
    * integers recovered as doubles: sd = C−D, ta2d/tb2d = Σt(t−1) per
    * marginal, ta3d/tb3d = Σt(t−1)(t−2), tavd/tbvd = Σt(t−1)(2t+5).
    * z uses the standard tie-corrected var(S) (Kendall 1948):
    * var(S) = (v0 − vt − vu)/18 + Σt(t−1)·Σu(u−1)/(2n(n−1))
    *        + Σt(t−1)(t−2)·Σu(u−1)(u−2)/(9n(n−1)(n−2)). */
  private val KendallSql: Seq[String] = {
    val n0 = "nd * (nd - 1e0) / 2e0"
    val varS = "(nd * (nd - 1e0) * (2e0 * nd + 5e0) - tavd - tbvd) / 18e0" +
      " + ta2d * tb2d / nullif(2e0 * nd * (nd - 1e0), 0e0)" +
      " + ta3d * tb3d / nullif(9e0 * nd * (nd - 1e0) * (nd - 2e0), 0e0)"
    Seq(
      "sd + 0.0 AS s_stat",
      s"round(sd / nullif(sqrt(($n0 - ta2d / 2e0) * ($n0 - tb2d / 2e0)), 0e0), 6) + 0.0 AS tau_b",
      s"round(sd / nullif(sqrt(greatest($varS, 0e0)), 0e0), 4) + 0.0 AS z_tau")
  }

  /** One-row (n_rows + recovered doubles) stats frame from a joint
    * cell grid (va, vb, cnt). S comes from the cell-grid self-join
    * restricted to va1 < va2 (strict — x-ties contribute nothing), so
    * the pair count is quadratic in CELL count, never row count. Every
    * product is decimal-first (CAST(· AS DECIMAL(38,0)) before the
    * multiply), so counts stay exact past 2^31 rows per cell. */
  private def kendallStats(pc: DataFrame): DataFrame = {
    val c1 = pc.select(col("va").as("va1"), col("vb").as("vb1"), col("cnt").as("n1"))
    val c2 = pc.select(col("va").as("va2"), col("vb").as("vb2"), col("cnt").as("n2"))
    val sAgg = c1.join(broadcast(c2), col("va1") < col("va2")).agg(
      expr("CAST(coalesce(sum(CAST(n1 AS DECIMAL(38,0)) * n2 *" +
        " (CASE WHEN vb2 > vb1 THEN 1 WHEN vb2 < vb1 THEN -1 ELSE 0 END)), 0)" +
        " AS DECIMAL(38,0))").as("s_raw"))
    def margStats(side: String, vcol: String, p2: String, p3: String,
        pv: String): DataFrame =
      pc.groupBy(col(vcol)).agg(expr("CAST(sum(cnt) AS BIGINT)").as("t")).agg(
        expr("CAST(sum(t) AS BIGINT)").as(s"n_$side"),
        expr("CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS DECIMAL(38,0))").as(p2),
        expr("CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1) * (t - 2)) AS DECIMAL(38,0))").as(p3),
        expr("CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)) AS DECIMAL(38,0))").as(pv))
    sAgg
      .crossJoin(margStats("a", "va", "ta2", "ta3", "tav"))
      .crossJoin(margStats("b", "vb", "tb2", "tb3", "tbv").drop("n_b"))
      .selectExpr(
        "n_a AS n_rows", "CAST(n_a AS DOUBLE) AS nd", "CAST(s_raw AS DOUBLE) AS sd",
        "CAST(ta2 AS DOUBLE) AS ta2d", "CAST(tb2 AS DOUBLE) AS tb2d",
        "CAST(ta3 AS DOUBLE) AS ta3d", "CAST(tb3 AS DOUBLE) AS tb3d",
        "CAST(tav AS DOUBLE) AS tavd", "CAST(tbv AS DOUBLE) AS tbvd")
  }

  /** Kendall τ-b of `colA` vs `colB` with the tie-corrected normal z.
    * Returns ONE row (n_rows, s_stat, tau_b, z_tau); n < 2 or a
    * constant column → NULL τ (nullif, never an ANSI error).
    *
    * Exactness: S = C − D and all four tie sums are exact integers
    * (cell counts cross-multiplied decimal-first; sign() never touches
    * a double product), so both engines enter the shared τ/z text with
    * bit-identical operands.
    *
    * Plan: ONE map-side-combined cell aggregate over the fact, then a
    * self-join + three aggregates over the CELL grid. Everything after
    * the scan is bounded by value-pair cardinality, not row count —
    * the q68 rank-map precondition, squared: quantize continuous
    * columns first (q47's binning) before asking for τ at 100 TB. */
  def kendallTauB(df: DataFrame, colA: String, colB: String): DataFrame = {
    val pc = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("va"), col(colB).as("vb"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
    kendallStats(pc).selectExpr(Seq("n_rows") ++ KendallSql: _*)
  }

  /** q101: Kendall τ-b for the three q68 measure pairs in one fact
    * scan — the triple grid (vq, vd, vt, cnt) is aggregated once and
    * localCheckpointed (≤ |q|·|d|·|t| cells), then each pair's joint
    * grid is a re-aggregate of the grid, never of the fact. Completes
    * the association family: Pearson (linear), Spearman (monotone,
    * rank), τ-b (monotone, concordance — the robust-to-outliers one
    * the reference's EDA would reach for on ordinal measures). */
  def kendallMatrix(fact: DataFrame): DataFrame = {
    val grid = fact
      .groupBy(VarNames.map { case (v, _) => col(SrcCols(v)).as(s"g$v") }: _*)
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // cell grid: cardinality-bounded, reused 3×
    val rows = VarPairs.map { case (a, b) =>
      val pc = grid.groupBy(col(s"g$a").as("va"), col(s"g$b").as("vb"))
        .agg(expr("CAST(sum(cnt) AS BIGINT)").as("cnt"))
      kendallStats(pc).selectExpr(
        Seq(s"'${VarNames.toMap.apply(a)}' AS var_a",
          s"'${VarNames.toMap.apply(b)}' AS var_b", "n_rows") ++ KendallSql: _*)
    }
    rows.reduce(_ unionByName _)
  }

  def kendallMatrix(spark: SparkSession, dir: String): DataFrame =
    kendallMatrix(Tables.lineitem(spark, dir))

  /** DuckDB twin: same cell grids, same exact integer sums (HUGEINT
    * products — DuckDB's exact wide integer — mirroring Spark's
    * decimal-first products; both are exact so the recovered doubles
    * are bit-identical), same shared τ/z text. */
  val kendallMatrixSql: String = {
    val pairCtes = VarPairs.map { case (a, b) =>
      s"""pc_$a$b AS (
         |  SELECT g$a AS va, g$b AS vb, CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM grid GROUP BY 1, 2),
         |s_$a$b AS (
         |  SELECT CAST(coalesce(sum(CAST(c1.cnt AS HUGEINT) * c2.cnt *
         |    (CASE WHEN c2.vb > c1.vb THEN 1 WHEN c2.vb < c1.vb THEN -1 ELSE 0 END)), 0)
         |    AS DOUBLE) AS sd
         |  FROM pc_$a$b c1 JOIN pc_$a$b c2 ON c1.va < c2.va),
         |ma_$a$b AS (
         |  SELECT CAST(sum(t) AS BIGINT) AS n_rows, CAST(sum(t) AS DOUBLE) AS nd,
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS DOUBLE) AS ta2d,
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS DOUBLE) AS ta3d,
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS DOUBLE) AS tavd
         |  FROM (SELECT va, CAST(sum(cnt) AS BIGINT) AS t FROM pc_$a$b GROUP BY 1)),
         |mb_$a$b AS (
         |  SELECT
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS DOUBLE) AS tb2d,
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS DOUBLE) AS tb3d,
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS DOUBLE) AS tbvd
         |  FROM (SELECT vb, CAST(sum(cnt) AS BIGINT) AS t FROM pc_$a$b GROUP BY 1))""".stripMargin
    }.mkString(",\n")
    val rows = VarPairs.map { case (a, b) =>
      s"""SELECT '${VarNames.toMap.apply(a)}' AS var_a,
         |  '${VarNames.toMap.apply(b)}' AS var_b, n_rows,
         |  ${KendallSql.mkString(",\n  ")}
         |FROM s_$a$b, ma_$a$b, mb_$a$b""".stripMargin
    }.mkString("\nUNION ALL\n")
    val gridCols = VarNames.map { case (v, _) => s"${SrcCols(v)} AS g$v" }
      .mkString(", ")
    s"""WITH grid AS (
       |  SELECT $gridCols, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem GROUP BY 1, 2, 3),
       |$pairCtes
       |$rows""".stripMargin
  }

  /** DuckDB twin: identical rank maps, identical snapped terms,
    * identical shared ρ text. */
  val corrMatrixSql: String = {
    val rankCtes = VarNames.map { case (v, _) =>
      s"""rm$v AS (
         |  SELECT v, CAST(2 * cumex + cnt + 1 AS DOUBLE) AS r$v FROM (
         |    SELECT v, cnt, coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumex
         |    FROM (SELECT ${SrcCols(v)} AS v, count(*) AS cnt
         |          FROM lineitem GROUP BY 1)))""".stripMargin
    }.mkString(",\n")
    val prepCols = (VarNames.map { case (v, _) =>
      s"floor(${SrcCols(v)} * $ValScale.0) AS v$v"
    } ++ VarNames.map { case (v, _) => s"rm$v.r$v AS r$v" }).mkString(", ")
    val joins = VarNames.map { case (v, _) =>
      s"JOIN rm$v ON ${SrcCols(v)} = rm$v.v"
    }.mkString(" ")
    val sums = TermExprs.map { case (n, t) =>
      s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS $n"
    }.mkString(",\n    ")
    val recov = TermExprs.map { case (n, _) => s"CAST($n AS DOUBLE) AS $n" }
      .mkString(", ")
    val rows = VarPairs.map { case (a, b) =>
      s"""SELECT '${VarNames.toMap.apply(a)}' AS var_a,
         |  '${VarNames.toMap.apply(b)}' AS var_b, n_rows,
         |  ${rhoSql(s"s_v$a", s"s_v$b", s"s_v${a}_v$b", s"s_v${a}_v$a", s"s_v${b}_v$b")} AS pearson_r,
         |  ${rhoSql(s"s_r$a", s"s_r$b", s"s_r${a}_r$b", s"s_r${a}_r$a", s"s_r${b}_r$b")} AS spearman_rho
         |FROM recovered""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH
       |$rankCtes,
       |prep AS (
       |  SELECT $prepCols FROM lineitem $joins),
       |stats AS (
       |  SELECT count(*) AS n_rows,
       |    $sums
       |  FROM prep),
       |recovered AS (
       |  SELECT n_rows, CAST(n_rows AS DOUBLE) AS nd, $recov FROM stats)
       |$rows""".stripMargin
  }
}
