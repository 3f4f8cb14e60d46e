package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Wald's Sequential Probability Ratio Test — the CONTINUOUS-
  * monitoring cousin of q153's group-sequential OBF monitor: OBF
  * spends error budget at a few scheduled looks; SPRT walks the
  * cumulative log-likelihood ratio after EVERY period and stops the
  * moment either boundary is crossed — the classical "stop the
  * experiment as early as the data allows" design, with error rates
  * (α, β) guaranteed by the Wald boundaries ln((1−β)/α), ln(β/(1−α)).
  *
  *   LLR_t = Σ_{d≤t} [ x_d·ln(p₁/p₀) + (m_d − x_d)·ln(q₁/q₀) ]
  *
  * Exactness: the TWO ln ratios are constants, snapped ONCE to the
  * 1e-9 nano-nat grid; each day's term is then x·L₁ + (m−x)·L₀ — an
  * EXACT BIGINT — so the whole walk, the boundaries (snapped the same
  * way), the crossing days, and the decision are integer-exact; no
  * accumulated float anywhere.
  *
  * Plan/scale: one scan → per-day (trials, successes) cells
  * (calendar-bounded) → one cumulative window over the spine → a
  * 1-row finish reading first-crossing days via conditional mins. */
object Sprt {

  /** SPRT from a per-period frame (d, m, x): period key, trials,
    * successes — testing H₁: p = p1 against H₀: p = p0 at (alpha,
    * beta). Returns one row: (n_periods, n_trials, n_success,
    * llr_final, upper_bound, lower_bound, decision, decided_period)
    * — decision ∈ accept_h1 | accept_h0 | continue, decided at the
    * FIRST crossing period. */
  def sprt(counts: DataFrame, p0: Double, p1: Double,
      alpha: Double, beta: Double): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0)
    val l1 = s"CAST(floor(ln(CAST($p1 AS DOUBLE) / CAST($p0 AS DOUBLE))" +
      " * 1e9 + 5e-1) AS BIGINT)"
    val l0 = s"CAST(floor(ln((1.0 - CAST($p1 AS DOUBLE))" +
      s" / (1.0 - CAST($p0 AS DOUBLE))) * 1e9 + 5e-1) AS BIGINT)"
    val up = s"CAST(floor(ln((1.0 - CAST($beta AS DOUBLE))" +
      s" / CAST($alpha AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)"
    val lo = s"CAST(floor(ln(CAST($beta AS DOUBLE)" +
      s" / (1.0 - CAST($alpha AS DOUBLE))) * 1e9 + 5e-1) AS BIGINT)"
    val wCum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("term", expr(s"x * ($l1) + (m - x) * ($l0)"))
      .withColumn("llr", sum("term").over(wCum))
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_periods"),
        expr("CAST(sum(m) AS BIGINT)").as("n_trials"),
        expr("CAST(sum(x) AS BIGINT)").as("n_success"),
        expr("CAST(sum(term) AS BIGINT)").as("llr_nano"),
        expr(s"CAST(min(CASE WHEN llr >= $up THEN d END) AS BIGINT)")
          .as("up_day"),
        expr(s"CAST(min(CASE WHEN llr <= $lo THEN d END) AS BIGINT)")
          .as("lo_day"))
      .selectExpr("n_periods", "n_trials", "n_success",
        "round(CAST(llr_nano AS DOUBLE) / 1e9, 6) + 0.0 AS llr_final",
        s"round(CAST($up AS DOUBLE) / 1e9, 6) + 0.0 AS upper_bound",
        s"round(CAST($lo AS DOUBLE) / 1e9, 6) + 0.0 AS lower_bound",
        "CASE WHEN up_day IS NOT NULL AND (lo_day IS NULL" +
          " OR up_day <= lo_day) THEN 'accept_h1'" +
          " WHEN lo_day IS NOT NULL THEN 'accept_h0'" +
          " ELSE 'continue' END AS decision",
        "CASE WHEN up_day IS NOT NULL AND (lo_day IS NULL" +
          " OR up_day <= lo_day) THEN up_day" +
          " WHEN lo_day IS NOT NULL THEN lo_day" +
          " ELSE CAST(NULL AS BIGINT) END AS decided_period")
  }

  // registered hypotheses: is the URGENT+HIGH share drifting up from
  // its design rate 0.40 to 0.42?
  val P0 = 0.40
  val P1 = 0.42
  val Alpha = 0.05
  val Beta = 0.2

  /** q197: monitor the daily share of urgent/high-priority orders —
    * would a sequential monitor have stopped, and when? */
  def urgentShareSprt(spark: SparkSession, dir: String): DataFrame =
    sprt(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderpriority").isNotNull)
      .groupBy(expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
        .as("d"))
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("m"),
        expr("CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1)" +
          " IN ('1', '2') THEN 1 ELSE 0 END) AS BIGINT)").as("x")),
      P0, P1, Alpha, Beta)

  /** DuckDB twin: identical constants, integer walk, crossing mins. */
  val urgentShareSprtSql: String = {
    val l1 = s"CAST(floor(ln(CAST($P1 AS DOUBLE) / CAST($P0 AS DOUBLE))" +
      " * 1e9 + 5e-1) AS BIGINT)"
    val l0 = s"CAST(floor(ln((1.0 - CAST($P1 AS DOUBLE))" +
      s" / (1.0 - CAST($P0 AS DOUBLE))) * 1e9 + 5e-1) AS BIGINT)"
    val up = s"CAST(floor(ln((1.0 - CAST($Beta AS DOUBLE))" +
      s" / CAST($Alpha AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)"
    val lo = s"CAST(floor(ln(CAST($Beta AS DOUBLE)" +
      s" / (1.0 - CAST($Alpha AS DOUBLE))) * 1e9 + 5e-1) AS BIGINT)"
    s"""WITH days AS (
       |  SELECT date_diff('day', DATE '1970-01-01',
       |      CAST(o_orderdate AS DATE)) AS d,
       |    CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1)
       |      IN ('1', '2') THEN 1 ELSE 0 END) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
       |  GROUP BY 1),
       |walked AS (
       |  SELECT *, x * ($l1) + (m - x) * ($l0) AS term,
       |    sum(x * ($l1) + (m - x) * ($l0)) OVER (ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
       |  FROM days),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_periods,
       |    CAST(sum(m) AS BIGINT) AS n_trials,
       |    CAST(sum(x) AS BIGINT) AS n_success,
       |    CAST(sum(term) AS BIGINT) AS llr_nano,
       |    CAST(min(CASE WHEN llr >= $up THEN d END) AS BIGINT) AS up_day,
       |    CAST(min(CASE WHEN llr <= $lo THEN d END) AS BIGINT) AS lo_day
       |  FROM walked)
       |SELECT n_periods, n_trials, n_success,
       |  round(CAST(llr_nano AS DOUBLE) / 1e9, 6) + 0.0 AS llr_final,
       |  round(CAST($up AS DOUBLE) / 1e9, 6) + 0.0 AS upper_bound,
       |  round(CAST($lo AS DOUBLE) / 1e9, 6) + 0.0 AS lower_bound,
       |  CASE WHEN up_day IS NOT NULL AND (lo_day IS NULL
       |    OR up_day <= lo_day) THEN 'accept_h1'
       |    WHEN lo_day IS NOT NULL THEN 'accept_h0'
       |    ELSE 'continue' END AS decision,
       |  CASE WHEN up_day IS NOT NULL AND (lo_day IS NULL
       |    OR up_day <= lo_day) THEN up_day
       |    WHEN lo_day IS NOT NULL THEN lo_day
       |    ELSE CAST(NULL AS BIGINT) END AS decided_period
       |FROM agg""".stripMargin
  }
}
