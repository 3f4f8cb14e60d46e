package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Weighted regression (SURVEY.md §2 #35): the model-fitting capability
  * behind the reference's headline analysis —
  * `glm(q2_yes_prop ~ ..., family = quasibinomial, weights =
  * response_total)` (/root/reference/run_analysis.Rmd:120-146) with tidy
  * coefficient extraction (run_analysis.Rmd:247-260).
  *
  * Engine shape: weighted least squares via closed-form normal
  * equations. The sufficient statistics (X'WX, X'Wy — 10 sums for two
  * predictors + intercept) are ONE map-side-combinable aggregate pass
  * over the fact, then the 3×3 solve is pure scalar arithmetic — so the
  * whole fit is a single job whose shuffle carries 10 numbers,
  * regardless of corpus size. The quasibinomial family is IRLS on top:
  * each iteration re-weights and re-runs the same one-pass WLS
  * ([[glmQuasibinomial]]).
  *
  * Oracle parity: double sums are order-dependent (Spark's partial
  * aggregation order ≠ DuckDB's), so the per-row terms are snapped to
  * fixed-point (floor(t·10⁶) summed as DECIMAL(38,0) — exact integer
  * arithmetic, order-free) and recovered to doubles before the solve.
  * The solve formulas are shared SQL text run by BOTH engines, so every
  * downstream double op has identical operand order → bitwise-equal
  * coefficients (SURVEY.md §5).
  */
object Regression {

  /** Fixed-point snap scale for sufficient-statistic terms. 10⁶ keeps
    * term·scale < 2^53 for O(10³)-magnitude features (exact floor on
    * both engines) while the DECIMAL(38,0) sums have ~10²⁸ headroom —
    * enough for 10²⁰ rows of such terms, i.e. never the overflow at
    * 100 TB (keep features O(1)–O(10³) by scaling, as here). */
  val FixedScale = 1000000.0

  /** (sum name, per-row term) for X'WX and X'Wy with X = [1, x1, x2].
    * The term strings are Spark AND DuckDB SQL — one source, no drift. */
  private val Terms: Seq[(String, String)] = Seq(
    "sw" -> "w",
    "sx1" -> "w * x1",
    "sx2" -> "w * x2",
    "sx11" -> "w * x1 * x1",
    "sx12" -> "w * x1 * x2",
    "sx22" -> "w * x2 * x2",
    "sy" -> "w * y",
    "sx1y" -> "w * x1 * y",
    "sx2y" -> "w * x2 * y",
    "syy" -> "w * y * y",
  )

  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"

  // Cramer's rule for the symmetric 3×3 system A·b = c,
  // A = [[sw,sx1,sx2],[sx1,sx11,sx12],[sx2,sx12,sx22]], c = [sy,sx1y,sx2y].
  // Shared text ⇒ identical FP operand order on both engines.
  private val DetSql =
    "(sw * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2))"
  private val Det0Sql =
    "(sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y))"
  private val Det1Sql =
    "(sw * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2))"
  private val Det2Sql =
    "(sw * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2))"
  /** Weighted R² from the same sums: SSE = Σwy² − b·(X'Wy) (exact at the
    * WLS optimum), SST = Σwy² − (Σwy)²/Σw. nullif: a constant-y input
    * has SST = 0 exactly — R² is undefined (NULL), not an ANSI
    * divide-by-zero. */
  private val R2Sql =
    "round(1.0 - (syy - (b0 * sy + b1 * sx1y + b2 * sx2y)) / nullif(syy - sy * sy / sw, 0.0), 6) + 0.0"

  /** One-pass sufficient statistics over a prepared frame with double
    * columns (w, x1, x2, y): exact DECIMAL(38,0) fixed-point sums. */
  def sufficientStats(rows: DataFrame): DataFrame =
    rows.agg(
      count(lit(1)).as("n_rows"),
      Terms.map { case (n, t) =>
        expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
      }: _*)

  private def recover(stats: DataFrame): DataFrame =
    stats.select(col("n_rows") +: Terms.map { case (n, _) =>
      expr(s"CAST(${n}_i AS DOUBLE) / $FixedScale").as(n)
    }: _*)

  /** Engine-side WLS fit: (w, x1, x2, y) rows → one row with
    * n_rows, b_intercept, b_x1, b_x2, r2 (coefficients round-6). */
  def wlsFit(rows: DataFrame): DataFrame =
    recover(sufficientStats(rows))
      .select(col("n_rows"),
        col("sw"), col("sy"), col("sx1y"), col("sx2y"), col("syy"),
        expr(s"$Det0Sql / $DetSql").as("b0"),
        expr(s"$Det1Sql / $DetSql").as("b1"),
        expr(s"$Det2Sql / $DetSql").as("b2"))
      .select(col("n_rows"),
        expr("round(b0, 6) + 0.0").as("b_intercept"),
        expr("round(b1, 6) + 0.0").as("b_x1"),
        expr("round(b2, 6) + 0.0").as("b_x2"),
        expr(R2Sql).as("r2"))

  /** Driver-side solve (for IRLS's per-iteration coefficients — three
    * doubles cross the driver per iteration, nothing else). */
  final case class Coefs(b0: Double, b1: Double, b2: Double, n: Long)

  def wlsFitCollect(rows: DataFrame): Coefs = {
    val r = recover(sufficientStats(rows)).head()
    def d(name: String): Double = r.getDouble(r.fieldIndex(name))
    val (sw, sx1, sx2) = (d("sw"), d("sx1"), d("sx2"))
    val (sx11, sx12, sx22) = (d("sx11"), d("sx12"), d("sx22"))
    val (sy, sx1y, sx2y) = (d("sy"), d("sx1y"), d("sx2y"))
    val det = sw * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val det0 = sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y)
    val det1 = sw * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
    val det2 = sw * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)
    Coefs(det0 / det, det1 / det, det2 / det, r.getLong(r.fieldIndex("n_rows")))
  }

  /** Quasibinomial GLM via IRLS (the reference's family;
    * run_analysis.Rmd:120-146): each iteration recomputes the working
    * response z = η + (y−μ)/(μ(1−μ)) and weight w·μ(1−μ), then re-runs
    * the one-pass WLS. Iterations are sequential jobs; per-iteration
    * driver traffic is 3 coefficients. Proportions y ∈ [0,1] with
    * case weights w, exactly like the reference's weighted glm. */
  def glmQuasibinomial(rows: DataFrame, iters: Int = 8): Coefs = {
    // 1 + iters actions over the same rows: pin the lineage once
    // instead of recomputing the caller's source pipeline per iteration
    val pinned = rows.persist()
    try {
      var b = wlsFitCollect(pinned) // linear-probability warm start
      for (_ <- 0 until iters) {
        val eta = lit(b.b0) + lit(b.b1) * col("x1") + lit(b.b2) * col("x2")
        val working = pinned
          .withColumn("eta", eta)
          .withColumn("mu", lit(1.0) / (lit(1.0) + exp(-col("eta"))))
          // clamp so a saturated μ can't zero the IRLS weight
          .withColumn("mu", least(greatest(col("mu"), lit(1e-10)), lit(1.0 - 1e-10)))
          .select(
            (col("w") * col("mu") * (lit(1.0) - col("mu"))).as("w"),
            col("x1"), col("x2"),
            (col("eta") + (col("y") - col("mu")) / (col("mu") * (lit(1.0) - col("mu")))).as("y"))
        b = wlsFitCollect(working)
      }
      b
    } finally pinned.unpersist()
  }

  // ---- q32: the registered fit on the testdata star schema ----

  /** Analysis frame mirroring the reference's unit of analysis (district
    * proportions with respondent-count weights → here: per-customer
    * proportion of F-status orders weighted by order count):
    * y = n_F/n, w = n, x1 = acctbal/10³, x2 = avg order value/10⁵.
    * The per-group price sum is snapped to exact cents before dividing
    * (double sum order differs between engines; SURVEY.md §5). */
  def regressionRows(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).cast("double").as("w"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("double").as("nf"),
        sum(expr("CAST(floor(o_totalprice * 100.0) AS DECIMAL(38,0))")).as("spi"))
    base.join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("w"),
        (col("nf") / col("w")).as("y"),
        (col("c_acctbal") / 1000.0).as("x1"),
        (col("spi").cast("double") / 100.0 / col("w") / 100000.0).as("x2"))
  }

  def regression(spark: SparkSession, dir: String): DataFrame =
    wlsFit(regressionRows(spark, dir))

  /** DuckDB twin: same row prep, same fixed-point sums, same shared
    * solve text — coefficients hash-match bitwise. */
  val regressionSql: String = {
    val sums = Terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0)) AS ${n}_i"
    }.mkString(",\n  ")
    val rec = Terms.map { case (n, _) =>
      s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
    }.mkString(",\n  ")
    s"""WITH base AS (
       |  SELECT o_custkey, CAST(count(*) AS DOUBLE) AS w,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) AS nf,
       |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spi
       |  FROM orders GROUP BY o_custkey),
       |rws AS (
       |  SELECT w, nf / w AS y, c_acctbal / 1000.0 AS x1,
       |    CAST(spi AS DOUBLE) / 100.0 / w / 100000.0 AS x2
       |  FROM base JOIN customer ON o_custkey = c_custkey),
       |sums AS (SELECT count(*) AS n_rows,
       |  $sums
       |FROM rws),
       |rec AS (SELECT n_rows,
       |  $rec
       |FROM sums),
       |solved AS (SELECT n_rows, sw, sy, sx1y, sx2y, syy,
       |  $Det0Sql / $DetSql AS b0,
       |  $Det1Sql / $DetSql AS b1,
       |  $Det2Sql / $DetSql AS b2
       |FROM rec)
       |SELECT n_rows,
       |  round(b0, 6) + 0.0 AS b_intercept,
       |  round(b1, 6) + 0.0 AS b_x1,
       |  round(b2, 6) + 0.0 AS b_x2,
       |  $R2Sql AS r2
       |FROM solved""".stripMargin
  }

  // ---- q89: per-group WLS (thousands of independent fits, one pass) ----

  /** Per-group WLS: the SAME one-pass sufficient statistics, keyed by
    * `groups` — a million segment-level fits cost ONE map-side-combined
    * aggregate (the shuffle carries 10 numbers per group) plus a
    * projection-level Cramer solve; no per-group jobs, no driver loop.
    * This is the grouped-model idiom (per-region elasticities,
    * per-cohort trends) the reference would run as an R `group_by %>%
    * do(lm(...))` loop. Groups too small or degenerate to identify the
    * 3-parameter model (n < 3 or |det| below fixed-point resolution)
    * yield NULL coefficients rather than garbage. */
  def wlsFitBy(rows: DataFrame, groups: Seq[String]): DataFrame =
    wlsSolveState(wlsPartial(rows, groups), groups)

  /** Per-group WLS sufficient statistics as MERGEABLE state — the
    * incremental-model-maintenance surface ([[IncrementalAgg]]'s s12
    * pattern composed with the q32 statistics): keep (n, X'WX, X'Wy)
    * per group as exact DECIMAL(38,0) fixed-point sums, fold each new
    * batch in with [[wlsPartial]] + [[wlsMerge]] (O(delta), touches
    * the stored dimension-grade state and the batch only), and
    * [[wlsSolveState]] re-derives coefficients on demand. The sums are
    * associative + commutative integers, so incremental == full
    * recompute EXACTLY, whatever the batch arrival order — a refreshed
    * 100 TB-corpus model costs one delta aggregate, not a history scan. */
  def wlsPartial(batch: DataFrame, groups: Seq[String]): DataFrame =
    batch.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        Terms.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)

  /** Merge two state frames (either may be empty); see [[wlsPartial]]. */
  def wlsMerge(a: DataFrame, b: DataFrame, groups: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groups.map(col): _*)
      .agg(expr("CAST(sum(n_rows) AS BIGINT)").as("n_rows"),
        Terms.map { case (n, _) =>
          expr(s"CAST(sum(${n}_i) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)

  /** Guarded per-group solve over a sufficient-statistics state frame
    * (from [[wlsPartial]]/[[wlsMerge]] — or any stored copy of them). */
  def wlsSolveState(stats: DataFrame, groups: Seq[String]): DataFrame = {
    val gcols = groups.map(col)
    val rec = stats.select(gcols ++ (col("n_rows") +: Terms.map { case (n, _) =>
      expr(s"CAST(${n}_i AS DOUBLE) / $FixedScale").as(n)
    }): _*)
    // nullif on the divisors: Catalyst subexpression elimination may
    // hoist these divisions out of their CASE guards when a caller
    // composes this frame further — ANSI-fatal on a singular group
    // unless the denominator is intrinsically safe (see keyedSolve)
    val guard = s"n_rows >= 3 AND abs($DetSql) > 1.0 / $FixedScale"
    rec
      .select(gcols ++ Seq(col("n_rows"),
        col("sw"), col("sy"), col("sx1y"), col("sx2y"), col("syy"),
        expr(s"CASE WHEN $guard THEN $Det0Sql / nullif($DetSql, 0.0) END").as("b0"),
        expr(s"CASE WHEN $guard THEN $Det1Sql / nullif($DetSql, 0.0) END").as("b1"),
        expr(s"CASE WHEN $guard THEN $Det2Sql / nullif($DetSql, 0.0) END").as("b2")): _*)
      .select(gcols ++ Seq(col("n_rows"),
        expr("round(b0, 6) + 0.0").as("b_intercept"),
        expr("round(b1, 6) + 0.0").as("b_x1"),
        expr("round(b2, 6) + 0.0").as("b_x2"),
        expr(s"CASE WHEN b0 IS NOT NULL THEN $R2Sql END").as("r2")): _*)
  }

  // ---- q94: GLM inference table (SE / t / p + dispersion) ----
  //
  // The reference's analysis deliverable is the tidy coefficient table
  // WITH standard errors and p-values
  // (/root/reference/run_analysis.Rmd:110-117:
  // `summary(ma_quasi)$coefficients[,"Std. Error"]`, `[,"Pr(>|t|)"]`).
  // This section emits that table from a fully DECLARATIVE IRLS chain:
  // each iteration cross-joins the 1-row coefficient frame back onto the
  // analysis rows (no driver collect anywhere), recomputes the working
  // response/weights, and re-runs the one-pass fixed-point WLS. The
  // whole fit is `iters`+2 map-side-combined aggregates whose shuffles
  // each carry ~10 numbers — the same scale shape as q32.
  //
  // Cross-engine discipline (SURVEY.md §5): every formula below is a
  // SHARED TEXT fragment run by both Spark and DuckDB. μ is snapped to
  // a 1e-9 grid right after the logistic link, because `exp` is the one
  // libm call whose last bit may differ between engines — after the
  // snap, every downstream double is bitwise identical, and the
  // per-iteration coefficients (solved from DECIMAL(38,0) fixed-point
  // sums via shared Cramer text) stay bitwise equal through the chain.

  /** Linear predictor from the joined 1-row coefficient frame. */
  private val EtaSql = "b0 + b1 * x1 + b2 * x2"

  /** Logistic mean SNAPPED to a 1e-9 grid (engine `exp` may differ in
    * the last ulp; the snap absorbs it) and clamped away from {0,1} so
    * a saturated μ can't zero the IRLS weight. Type discipline: the
    * explicit CAST AS DOUBLE and e-notation literals keep BOTH engines
    * in DOUBLE — Spark's floor(DOUBLE) returns BIGINT, and an unguarded
    * `floor(...)/1000000000.0` would run the snap (and everything
    * downstream of μ) in exact DECIMAL on Spark while DuckDB stays in
    * DOUBLE, rounding products differently in the last ulp. */
  private val MuSnapSql =
    "least(greatest(CAST(floor((1.0 / (1.0 + exp(-(eta)))) * 1e9 + 0.5) AS DOUBLE) / 1e9, 1e-9), 1.0 - 1e-9)"

  /** IRLS working weight w·μ(1−μ) and working response z = η+(y−μ)/μ(1−μ). */
  private val WorkWSql = "w * (mu * (1.0 - mu))"
  private val WorkYSql = "eta + (y - mu) / (mu * (1.0 - mu))"

  /** Pearson dispersion (quasibinomial φ): Σ w(y−μ)²/μ(1−μ) over n−p.
    * nullif keeps a saturated group (n = p = 3) at NULL dispersion
    * instead of an ANSI divide-by-zero. */
  private val PhiSql = "sprs / nullif(CAST(n_rows AS DOUBLE) - 3.0, 0.0)"

  /** Diagonal cofactors of the symmetric X'WX (for (X'WX)⁻¹_jj = cof/det). */
  private val Cof0Sql = "sx11 * sx22 - sx12 * sx12"
  private val Cof1Sql = "sw * sx22 - sx2 * sx2"
  private val Cof2Sql = "sw * sx11 - sx1 * sx1"
  private def seSql(cof: String): String =
    s"sqrt(phi * (($cof) / nullif($DetSql, 0.0)))"

  /** Two-sided p-value under the normal approximation:
    * p = erfc(|t|/√2), erfc via Abramowitz–Stegun 7.1.26 (|err| ≤
    * 1.5e-7 — below the round-6 output grid). R's summary.glm uses the
    * t-distribution with n−p df; at the reference's n (hundreds+) the
    * two differ below 1e-4 — documented approximation, not drift. */
  private def pSql(t: String): String = {
    val x = s"(abs($t) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Inference-pass sums: X'WX at the FINAL IRLS weights (wm) plus the
    * Pearson statistic on the ORIGINAL (w, y). Same fixed-point
    * DECIMAL(38,0) discipline as [[Terms]]. */
  private val InfSums: Seq[(String, String)] = Seq(
    "sw" -> "wm",
    "sx1" -> "wm * x1",
    "sx2" -> "wm * x2",
    "sx11" -> "wm * x1 * x1",
    "sx12" -> "wm * x1 * x2",
    "sx22" -> "wm * x2 * x2",
    "sprs" -> "w * (y - mu) * (y - mu) / (mu * (1.0 - mu))",
  )

  /** Unrounded 1-row coefficient frame from sufficient stats (shared
    * Cramer text — bitwise-identical solve on both engines). */
  private def solveCoefs(stats: DataFrame): DataFrame =
    recover(stats).selectExpr(
      s"$Det0Sql / $DetSql AS b0",
      s"$Det1Sql / $DetSql AS b1",
      s"$Det2Sql / $DetSql AS b2")

  /** (w,x1,x2,y) × 1-row coefs → + (eta, mu) via the shared fragments. */
  private def linked(rows: DataFrame, coefs: DataFrame): DataFrame =
    rows.crossJoin(coefs)
      .selectExpr("w", "x1", "x2", "y", s"$EtaSql AS eta")
      .selectExpr("w", "x1", "x2", "y", "eta", s"$MuSnapSql AS mu")

  /** Shared 1-row inference frame at the final IRLS β — columns
    * (n_rows, phi, b0..b2, se0..se2), the common tail of
    * [[glmInference]] and [[glmConfInt]]. */
  private def glmInfFrame(rows: DataFrame, iters: Int): DataFrame = {
    // pin the analysis frame once: the chain re-reads it iters+2 times
    // (warm start, each refit, inference pass), and recomputing the
    // caller's source pipeline per pass would dominate the fit cost.
    // localCheckpoint (the pagerank/q67 precedent) caches without the
    // unpersist-scoping problem a persist would have on a returned
    // lazy frame; blocks free when the result's lineage is collected.
    val pinned = rows.localCheckpoint()
    var b = solveCoefs(sufficientStats(pinned)) // linear-probability warm start
    for (_ <- 0 until iters) {
      val working = linked(pinned, b)
        .selectExpr(s"$WorkWSql AS w", "x1", "x2", s"$WorkYSql AS y")
      b = solveCoefs(sufficientStats(working))
    }
    val infRows = linked(pinned, b)
      .selectExpr(s"$WorkWSql AS wm", "w", "x1", "x2", "y", "mu")
    val stats = infRows.agg(
      count(lit(1)).as("n_rows"),
      InfSums.map { case (n, t) =>
        expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
      }: _*)
    val rec = stats.select(col("n_rows") +: InfSums.map { case (n, _) =>
      expr(s"CAST(${n}_i AS DOUBLE) / $FixedScale").as(n)
    }: _*)
    rec.crossJoin(b)
      .selectExpr("n_rows", "b0", "b1", "b2", s"$PhiSql AS phi",
        "sw", "sx1", "sx2", "sx11", "sx12", "sx22")
      .selectExpr("n_rows", "b0", "b1", "b2", "phi",
        s"${seSql(Cof0Sql)} AS se0", s"${seSql(Cof1Sql)} AS se1", s"${seSql(Cof2Sql)} AS se2")
  }

  /** Quasibinomial GLM inference table: one tidy row per coefficient —
    * (term, estimate, std_error, t_value, p_value, dispersion, n_rows),
    * the `summary(glm)$coefficients` deliverable. Declarative end to
    * end: `iters` IRLS refits (each a cross-join + one-pass aggregate)
    * then one inference pass at the final β computing X'WX, the Pearson
    * φ, SEs from the cofactor diagonal, and erfc p-values. */
  def glmInference(rows: DataFrame, iters: Int = 6): DataFrame = {
    glmInfFrame(rows, iters)
      .selectExpr("n_rows", "phi",
        "stack(3, 'intercept', b0, se0, b0 / nullif(se0, 0.0), 'x1', b1, se1, b1 / nullif(se1, 0.0), 'x2', b2, se2, b2 / nullif(se2, 0.0)) AS (term, est, se, tv)")
      .selectExpr("term",
        "round(est, 6) + 0.0 AS estimate",
        "round(se, 6) + 0.0 AS std_error",
        "round(tv, 6) + 0.0 AS t_value",
        s"round(${pSql("tv")}, 6) + 0.0 AS p_value",
        "round(phi, 6) + 0.0 AS dispersion",
        "n_rows")
  }

  /** q94: the inference table for the q32 analysis frame. */
  def glmInferenceQ(spark: SparkSession, dir: String): DataFrame =
    glmInference(regressionRows(spark, dir), iters = 6)

  /** 95% Wald z (normal approximation — same documented stance as
    * [[pSql]]: R's `confint.default` uses exactly this constant). */
  private val Z95 = "1.959963985"

  /** exp SNAPPED to a 1e-9 grid — the [[MuSnapSql]] discipline: engine
    * `exp` may differ in the last ulp, and an unsnapped value at a
    * round-6 boundary would be a parity coin-flip. Same DOUBLE-cast
    * guard (Spark floor(DOUBLE) → BIGINT otherwise). */
  private def expSnapSql(x: String): String =
    s"CAST(floor(exp($x) * 1e9 + 0.5) AS DOUBLE) / 1e9"

  /** Wald confidence intervals + odds-ratio table for the
    * quasibinomial GLM — the reference's FINAL analysis artifact
    * (`run_analysis.Rmd:193-211` plots `tidy(conf.int = TRUE)`'s
    * conf.low/conf.high per coefficient on a log odds-ratio scale).
    * One tidy row per coefficient: estimate, conf_low/high on the
    * linear-predictor scale (est ± z·SE on the RAW unrounded chain),
    * and the exp() transform of all three (odds ratios). NULL SE (the
    * saturated-fit convention) propagates NULL bounds, never garbage.
    * Same cost as [[glmInference]] — the chain is shared; only the
    * final 1-row projection differs. */
  def glmConfInt(rows: DataFrame, iters: Int = 6): DataFrame =
    glmInfFrame(rows, iters)
      .selectExpr(
        "stack(3, 'intercept', b0, se0, 'x1', b1, se1, 'x2', b2, se2) AS (term, est, se)")
      .selectExpr("term",
        "round(est, 6) + 0.0 AS estimate",
        s"round(est - $Z95 * se, 6) + 0.0 AS conf_low",
        s"round(est + $Z95 * se, 6) + 0.0 AS conf_high",
        s"round(${expSnapSql("est")}, 6) + 0.0 AS odds_ratio",
        s"round(${expSnapSql(s"est - $Z95 * se")}, 6) + 0.0 AS or_low",
        s"round(${expSnapSql(s"est + $Z95 * se")}, 6) + 0.0 AS or_high")

  /** q158: the confidence-interval/odds-ratio table for the q32
    * analysis frame. */
  def glmConfIntQ(spark: SparkSession, dir: String): DataFrame =
    glmConfInt(regressionRows(spark, dir), iters = 6)

  /** Shared DuckDB CTE chain through the `inf2` frame (n_rows, phi,
    * b0..b2, se0..se2) — the SAME iteration cascade both [[glmInferenceSql]]
    * and [[glmConfIntSql]] select their tidy tails from. Every
    * per-row/solve/inference formula is the same text fragment Spark
    * runs, so the tables hash-match bitwise. */
  private val GlmInfPrefixSql: String = {
    def sumsSql(terms: Seq[(String, String)]): String = terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0)) AS ${n}_i"
    }.mkString(",\n  ")
    def recSql(terms: Seq[(String, String)]): String = terms.map { case (n, _) =>
      s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
    }.mkString(",\n  ")
    val iterCtes = (1 to 6).map { k =>
      s"""wrk$k AS (
         |  SELECT $WorkWSql AS w, x1, x2, $WorkYSql AS y
         |  FROM (SELECT w, x1, x2, y, eta, $MuSnapSql AS mu
         |        FROM (SELECT r.w, r.x1, r.x2, r.y, $EtaSql AS eta
         |              FROM rws r CROSS JOIN c${k - 1}))),
         |s$k AS (SELECT count(*) AS n_rows,
         |  ${sumsSql(Terms)}
         |FROM wrk$k),
         |r$k AS (SELECT n_rows,
         |  ${recSql(Terms)}
         |FROM s$k),
         |c$k AS (SELECT $Det0Sql / $DetSql AS b0, $Det1Sql / $DetSql AS b1, $Det2Sql / $DetSql AS b2 FROM r$k)"""
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT o_custkey, CAST(count(*) AS DOUBLE) AS w,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) AS nf,
       |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spi
       |  FROM orders GROUP BY o_custkey),
       |rws AS (
       |  SELECT w, nf / w AS y, c_acctbal / 1000.0 AS x1,
       |    CAST(spi AS DOUBLE) / 100.0 / w / 100000.0 AS x2
       |  FROM base JOIN customer ON o_custkey = c_custkey),
       |s0 AS (SELECT count(*) AS n_rows,
       |  ${sumsSql(Terms)}
       |FROM rws),
       |r0 AS (SELECT n_rows,
       |  ${recSql(Terms)}
       |FROM s0),
       |c0 AS (SELECT $Det0Sql / $DetSql AS b0, $Det1Sql / $DetSql AS b1, $Det2Sql / $DetSql AS b2 FROM r0),
       |$iterCtes,
       |infw AS (
       |  SELECT $WorkWSql AS wm, w, x1, x2, y, mu
       |  FROM (SELECT w, x1, x2, y, eta, $MuSnapSql AS mu
       |        FROM (SELECT r.w, r.x1, r.x2, r.y, $EtaSql AS eta
       |              FROM rws r CROSS JOIN c6))),
       |infs AS (SELECT count(*) AS n_rows,
       |  ${sumsSql(InfSums)}
       |FROM infw),
       |infr AS (SELECT n_rows,
       |  ${recSql(InfSums)}
       |FROM infs),
       |inf AS (SELECT n_rows, b0, b1, b2, $PhiSql AS phi, sw, sx1, sx2, sx11, sx12, sx22
       |        FROM infr CROSS JOIN c6),
       |inf2 AS (SELECT n_rows, b0, b1, b2, phi,
       |  ${seSql(Cof0Sql)} AS se0, ${seSql(Cof1Sql)} AS se1, ${seSql(Cof2Sql)} AS se2
       |FROM inf)""".stripMargin
  }

  val glmInferenceSql: String =
    s"""$GlmInfPrefixSql,
       |tidy AS (
       |  SELECT 'intercept' AS term, b0 AS est, se0 AS se, b0 / nullif(se0, 0.0) AS tv, phi, n_rows FROM inf2
       |  UNION ALL SELECT 'x1', b1, se1, b1 / nullif(se1, 0.0), phi, n_rows FROM inf2
       |  UNION ALL SELECT 'x2', b2, se2, b2 / nullif(se2, 0.0), phi, n_rows FROM inf2)
       |SELECT term,
       |  round(est, 6) + 0.0 AS estimate,
       |  round(se, 6) + 0.0 AS std_error,
       |  round(tv, 6) + 0.0 AS t_value,
       |  round(${pSql("tv")}, 6) + 0.0 AS p_value,
       |  round(phi, 6) + 0.0 AS dispersion,
       |  n_rows
       |FROM tidy""".stripMargin

  /** DuckDB twin of [[glmConfIntQ]]: same prefix chain, the CI tail. */
  val glmConfIntSql: String =
    s"""$GlmInfPrefixSql,
       |tidy AS (
       |  SELECT 'intercept' AS term, b0 AS est, se0 AS se FROM inf2
       |  UNION ALL SELECT 'x1', b1, se1 FROM inf2
       |  UNION ALL SELECT 'x2', b2, se2 FROM inf2)
       |SELECT term,
       |  round(est, 6) + 0.0 AS estimate,
       |  round(est - $Z95 * se, 6) + 0.0 AS conf_low,
       |  round(est + $Z95 * se, 6) + 0.0 AS conf_high,
       |  round(${expSnapSql("est")}, 6) + 0.0 AS odds_ratio,
       |  round(${expSnapSql(s"est - $Z95 * se")}, 6) + 0.0 AS or_low,
       |  round(${expSnapSql(s"est + $Z95 * se")}, 6) + 0.0 AS or_high
       |FROM tidy""".stripMargin

  /** The q32 analysis frame keyed by customer nation (shared by q89 and
    * q95). */
  private def nationRows(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).cast("double").as("w"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("double").as("nf"),
        sum(expr("CAST(floor(o_totalprice * 100.0) AS DECIMAL(38,0))")).as("spi"))
    base
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("w"),
        (col("nf") / col("w")).as("y"),
        (col("c_acctbal") / 1000.0).as("x1"),
        (col("spi").cast("double") / 100.0 / col("w") / 100000.0).as("x2"))
  }

  /** q89: the q32 analysis fit per customer nation — 25 independent
    * models from one aggregate pass. */
  def regressionByNation(spark: SparkSession, dir: String): DataFrame =
    wlsFitBy(nationRows(spark, dir), Seq("c_nationkey"))

  val regressionByNationSql: String = {
    val sums = Terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0)) AS ${n}_i"
    }.mkString(",\n  ")
    val rec = Terms.map { case (n, _) =>
      s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
    }.mkString(",\n  ")
    val guard = s"n_rows >= 3 AND abs($DetSql) > 1.0 / $FixedScale"
    s"""WITH base AS (
       |  SELECT o_custkey, CAST(count(*) AS DOUBLE) AS w,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) AS nf,
       |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spi
       |  FROM orders GROUP BY o_custkey),
       |rws AS (
       |  SELECT c_nationkey, w, nf / w AS y, c_acctbal / 1000.0 AS x1,
       |    CAST(spi AS DOUBLE) / 100.0 / w / 100000.0 AS x2
       |  FROM base JOIN customer ON o_custkey = c_custkey),
       |sums AS (SELECT c_nationkey, count(*) AS n_rows,
       |  $sums
       |FROM rws GROUP BY c_nationkey),
       |rec AS (SELECT c_nationkey, n_rows,
       |  $rec
       |FROM sums),
       |solved AS (SELECT c_nationkey, n_rows, sw, sy, sx1y, sx2y, syy,
       |  CASE WHEN $guard THEN $Det0Sql / nullif($DetSql, 0.0) END AS b0,
       |  CASE WHEN $guard THEN $Det1Sql / nullif($DetSql, 0.0) END AS b1,
       |  CASE WHEN $guard THEN $Det2Sql / nullif($DetSql, 0.0) END AS b2
       |FROM rec)
       |SELECT c_nationkey, n_rows,
       |  round(b0, 6) + 0.0 AS b_intercept,
       |  round(b1, 6) + 0.0 AS b_x1,
       |  round(b2, 6) + 0.0 AS b_x2,
       |  CASE WHEN b0 IS NOT NULL THEN $R2Sql END AS r2
       |FROM solved""".stripMargin
  }

  // ---- q95: per-group quasibinomial GLM (grouped IRLS, no driver loop) ----
  //
  // q89 gives thousands of per-group LINEAR fits in one pass; q95
  // completes them to the reference's actual family
  // (run_analysis.Rmd:80-98 fits ONE quasibinomial model — a
  // segment-level user fits one per group). Shape: each IRLS iteration
  // is one keyed sufficient-stats aggregate (shuffle carries ~10
  // numbers per group) + one equi-join of the rows against the
  // group-level coefficient frame (dimension-grade — broadcast at
  // nation/segment cardinality, shuffle join with AQE beyond). No
  // driver loop, no per-group jobs: a million groups iterate together.
  // Degenerate groups (n < 3 or singular X'WX) carry NULL coefficients
  // from the warm start onward — their working rows are NULL and stay
  // NULL, never garbage.

  /** Guarded identifiability condition shared by q89/q95 and both
    * engines. */
  private val GuardSql = s"n_rows >= 3 AND abs($DetSql) > 1.0 / $FixedScale"

  private def keyedStats(rows: DataFrame, groups: Seq[String]): DataFrame =
    rows.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        Terms.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)

  /** Per-group guarded solve → (groups, b0, b1, b2), unrounded. The
    * nullif on the divisor matters beyond taste: once the iteration
    * chain is composed, Catalyst collapses the projections and its
    * codegen subexpression elimination may hoist these divisions OUT of
    * their CASE guards — an eagerly evaluated det=0 division is an ANSI
    * runtime error unless the denominator is intrinsically safe. */
  private def keyedSolve(stats: DataFrame, groups: Seq[String]): DataFrame =
    stats
      .select(groups.map(col) ++ (col("n_rows") +: Terms.map { case (n, _) =>
        expr(s"CAST(${n}_i AS DOUBLE) / $FixedScale").as(n)
      }): _*)
      .select(groups.map(col) ++ Seq(
        expr(s"CASE WHEN $GuardSql THEN $Det0Sql / nullif($DetSql, 0.0) END").as("b0"),
        expr(s"CASE WHEN $GuardSql THEN $Det1Sql / nullif($DetSql, 0.0) END").as("b1"),
        expr(s"CASE WHEN $GuardSql THEN $Det2Sql / nullif($DetSql, 0.0) END").as("b2")): _*)

  /** rows ⋈ per-group coefs → + (eta, mu) via the shared fragments. */
  private def linkedBy(rows: DataFrame, coefs: DataFrame, groups: Seq[String]): DataFrame =
    rows.join(coefs, groups)
      .selectExpr(groups ++ Seq("w", "x1", "x2", "y", s"$EtaSql AS eta"): _*)
      .selectExpr(groups ++ Seq("w", "x1", "x2", "y", "eta", s"$MuSnapSql AS mu"): _*)

  /** Per-group quasibinomial GLM with inference: one tidy row per group
    * — (groups, n_rows, b_intercept, b_x1, b_x2, se_intercept, se_x1,
    * se_x2, dispersion). Same μ-snap/fixed-point discipline as
    * [[glmInference]], keyed. */
  def glmQuasibinomialBy(rows: DataFrame, groups: Seq[String], iters: Int = 4): DataFrame = {
    val pinned = rows.localCheckpoint() // see glmInference: iters+2 re-reads
    var b = keyedSolve(keyedStats(pinned, groups), groups) // LPM warm start
    for (_ <- 0 until iters) {
      val working = linkedBy(pinned, b, groups)
        .selectExpr(groups ++ Seq(s"$WorkWSql AS w", "x1", "x2", s"$WorkYSql AS y"): _*)
      b = keyedSolve(keyedStats(working, groups), groups)
    }
    val infRows = linkedBy(pinned, b, groups)
      .selectExpr(groups ++ Seq(s"$WorkWSql AS wm", "w", "x1", "x2", "y", "mu"): _*)
    val stats = infRows.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        InfSums.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
    val rec = stats.select(groups.map(col) ++ (col("n_rows") +: InfSums.map { case (n, _) =>
      expr(s"CAST(${n}_i AS DOUBLE) / $FixedScale").as(n)
    }): _*)
    rec.join(b, groups)
      .selectExpr(groups ++ Seq("n_rows", "b0", "b1", "b2", s"$PhiSql AS phi",
        "sw", "sx1", "sx2", "sx11", "sx12", "sx22"): _*)
      .selectExpr(groups ++ Seq("n_rows", "b0", "b1", "b2", "phi",
        s"${seSql(Cof0Sql)} AS se0", s"${seSql(Cof1Sql)} AS se1", s"${seSql(Cof2Sql)} AS se2"): _*)
      .selectExpr(groups ++ Seq("n_rows",
        "round(b0, 6) + 0.0 AS b_intercept",
        "round(b1, 6) + 0.0 AS b_x1",
        "round(b2, 6) + 0.0 AS b_x2",
        "round(se0, 6) + 0.0 AS se_intercept",
        "round(se1, 6) + 0.0 AS se_x1",
        "round(se2, 6) + 0.0 AS se_x2",
        // exact t statistics — the screening key when thousands of
        // segment fits come back (p is left to q94's ungrouped table:
        // its normal approximation degrades at small per-group n).
        // nullif: a saturated fit (zero dispersion ⇒ zero SE) gets a
        // NULL t, not a divide-by-zero
        "round(b0 / nullif(se0, 0.0), 6) + 0.0 AS t_intercept",
        "round(b1 / nullif(se1, 0.0), 6) + 0.0 AS t_x1",
        "round(b2 / nullif(se2, 0.0), 6) + 0.0 AS t_x2",
        "round(phi, 6) + 0.0 AS dispersion"): _*)
  }

  /** q95: the per-nation quasibinomial fits for the q32 analysis frame. */
  def groupGlm(spark: SparkSession, dir: String): DataFrame =
    glmQuasibinomialBy(nationRows(spark, dir), Seq("c_nationkey"), iters = 4)

  /** DuckDB twin of [[groupGlm]]: the keyed CTE cascade from the same
    * shared fragments — grouped sums, guarded solves, USING joins. */
  val groupGlmSql: String = {
    def sumsSql(terms: Seq[(String, String)]): String = terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0)) AS ${n}_i"
    }.mkString(",\n  ")
    def recSql(terms: Seq[(String, String)]): String = terms.map { case (n, _) =>
      s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
    }.mkString(",\n  ")
    def solveCte(k: Int, src: String): String =
      s"""r$k AS (SELECT c_nationkey, n_rows,
         |  ${recSql(Terms)}
         |FROM $src),
         |c$k AS (SELECT c_nationkey,
         |  CASE WHEN $GuardSql THEN $Det0Sql / nullif($DetSql, 0.0) END AS b0,
         |  CASE WHEN $GuardSql THEN $Det1Sql / nullif($DetSql, 0.0) END AS b1,
         |  CASE WHEN $GuardSql THEN $Det2Sql / nullif($DetSql, 0.0) END AS b2
         |FROM r$k)"""
    val iterCtes = (1 to 4).map { k =>
      s"""wrk$k AS (
         |  SELECT c_nationkey, $WorkWSql AS w, x1, x2, $WorkYSql AS y
         |  FROM (SELECT c_nationkey, w, x1, x2, y, eta, $MuSnapSql AS mu
         |        FROM (SELECT r.c_nationkey, r.w, r.x1, r.x2, r.y, $EtaSql AS eta
         |              FROM rws r JOIN c${k - 1} USING (c_nationkey)))),
         |s$k AS (SELECT c_nationkey, count(*) AS n_rows,
         |  ${sumsSql(Terms)}
         |FROM wrk$k GROUP BY c_nationkey),
         |${solveCte(k, s"s$k")}"""
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT o_custkey, CAST(count(*) AS DOUBLE) AS w,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) AS nf,
       |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spi
       |  FROM orders GROUP BY o_custkey),
       |rws AS (
       |  SELECT c_nationkey, w, nf / w AS y, c_acctbal / 1000.0 AS x1,
       |    CAST(spi AS DOUBLE) / 100.0 / w / 100000.0 AS x2
       |  FROM base JOIN customer ON o_custkey = c_custkey),
       |s0 AS (SELECT c_nationkey, count(*) AS n_rows,
       |  ${sumsSql(Terms)}
       |FROM rws GROUP BY c_nationkey),
       |${solveCte(0, "s0")},
       |$iterCtes,
       |infw AS (
       |  SELECT c_nationkey, $WorkWSql AS wm, w, x1, x2, y, mu
       |  FROM (SELECT c_nationkey, w, x1, x2, y, eta, $MuSnapSql AS mu
       |        FROM (SELECT r.c_nationkey, r.w, r.x1, r.x2, r.y, $EtaSql AS eta
       |              FROM rws r JOIN c4 USING (c_nationkey)))),
       |infs AS (SELECT c_nationkey, count(*) AS n_rows,
       |  ${sumsSql(InfSums)}
       |FROM infw GROUP BY c_nationkey),
       |infr AS (SELECT c_nationkey, n_rows,
       |  ${recSql(InfSums)}
       |FROM infs),
       |inf AS (SELECT c_nationkey, n_rows, b0, b1, b2, $PhiSql AS phi,
       |  sw, sx1, sx2, sx11, sx12, sx22
       |FROM infr JOIN c4 USING (c_nationkey)),
       |inf2 AS (SELECT c_nationkey, n_rows, b0, b1, b2, phi,
       |  ${seSql(Cof0Sql)} AS se0, ${seSql(Cof1Sql)} AS se1, ${seSql(Cof2Sql)} AS se2
       |FROM inf)
       |SELECT c_nationkey, n_rows,
       |  round(b0, 6) + 0.0 AS b_intercept,
       |  round(b1, 6) + 0.0 AS b_x1,
       |  round(b2, 6) + 0.0 AS b_x2,
       |  round(se0, 6) + 0.0 AS se_intercept,
       |  round(se1, 6) + 0.0 AS se_x1,
       |  round(se2, 6) + 0.0 AS se_x2,
       |  round(b0 / nullif(se0, 0.0), 6) + 0.0 AS t_intercept,
       |  round(b1 / nullif(se1, 0.0), 6) + 0.0 AS t_x1,
       |  round(b2 / nullif(se2, 0.0), 6) + 0.0 AS t_x2,
       |  round(phi, 6) + 0.0 AS dispersion
       |FROM inf2""".stripMargin
  }
}
