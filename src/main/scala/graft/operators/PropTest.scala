package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-proportion z-test — the A/B-test primitive the hypothesis
  * suite was missing: q96–q100 compare means, ranks and whole
  * distributions, but the workhorse experiment readout ("did variant
  * B convert better?") is a difference of PROPORTIONS over hash-
  * bucketed units. Completes the suite with the pooled-SE z and its
  * normal p (the q100 BH machinery composes downstream for many-
  * variant families).
  *
  * Semantics: units are entities (not events); assignment is the
  * deterministic hash bucket (id mod 2 → A/B — the industry
  * assignment shape); a unit converts if it has ≥ 1 success event.
  * Pooled two-sided z; p via the shared Abramowitz–Stegun erfc chain
  * from the round-4-snapped z (the q100 discipline — both engines
  * enter the polynomial with the identical double).
  *
  * Exactness: counts are exact integers; the z formula is one shared
  * text chain of IEEE ops from those integers; p from snapped z.
  *
  * Plan/scale: one per-unit aggregate (map-side combinable), one
  * 2-row bucket aggregate, one 1-row pivot — no window, no join.
  */
object PropTest {

  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Pooled two-proportion z-test over a per-unit frame with a numeric
    * id column `u` and a 0/1 outcome `conv`; assignment is the id's
    * parity bucket. */
  def propZTest(units: DataFrame): DataFrame = {
    units
      .selectExpr("CASE WHEN u % 2 = 0 THEN 'A' ELSE 'B' END AS bucket",
        "conv")
      .groupBy("bucket")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(conv) AS BIGINT)").as("x"))
      .agg(
        expr("CAST(max(CASE WHEN bucket = 'A' THEN n END) AS BIGINT)").as("n_a"),
        expr("CAST(max(CASE WHEN bucket = 'A' THEN x END) AS BIGINT)").as("x_a"),
        expr("CAST(max(CASE WHEN bucket = 'B' THEN n END) AS BIGINT)").as("n_b"),
        expr("CAST(max(CASE WHEN bucket = 'B' THEN x END) AS BIGINT)").as("x_b"))
      .selectExpr("n_a", "x_a", "n_b", "x_b",
        "CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa",
        "CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb",
        "CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp")
      .selectExpr("n_a", "x_a", "n_b", "x_b",
        "round(pa, 6) + 0.0 AS p_a", "round(pb, 6) + 0.0 AS p_b",
        "round(pa - pb, 6) + 0.0 AS diff",
        "round((pa - pb) / nullif(sqrt(pp * (1.0 - pp)" +
          " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0e0)," +
          " 4) + 0.0 AS z")
      .selectExpr("n_a", "x_a", "n_b", "x_b", "p_a", "p_b", "diff", "z",
        s"round(${pSql("z")}, 6) + 0.0 AS p_value")
  }

  // ------------------ q275: power analysis / MDE (experiment design) ------------------

  /** z_{0.975} and z_{0.80}, pinned literals (the q94/q269 CI family;
    * z_{0.80} from the standard normal quantile — A&S 26.2.23-grade
    * precision is irrelevant here because both engines share the
    * literal). */
  private val Z975 = "1.959963984540054"
  private val Z80 = "0.8416212335729143"

  /** q275: the experiment-DESIGN companion to the testing deck — q132
    * tests a finished experiment, q250 guards its assignment, q153
    * monitors it sequentially; this answers the question asked BEFORE
    * any of them: at the observed baseline rate and unit count, what
    * effect could a 50/50 test even detect, and how many units per
    * arm would a 5%-relative-lift detection need? Standard two-sample
    * proportion power approximation (α = 0.05 two-sided, 80% power,
    * equal variances):
    *
    *   MDE_abs = (z_{0.975}+z_{0.80})·√(2·p̂(1−p̂)/n_arm)
    *   n_arm(δ) = ⌈2·(z_{0.975}+z_{0.80})²·p̂(1−p̂)/δ²⌉,  δ = 0.05·p̂
    *
    * One row per event type: p̂ = distinct users with the type /
    * distinct users — exact integer counts into one shared-text
    * closed-form chain (n_arm here = half the observed units, the
    * 50/50 design read). Degenerate rates (p̂ = 0 or 1) NULL the
    * design columns (nullif on δ², zero variance). */
  def conversionPowerMde(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select("user_id", "event_type").localCheckpoint(true)
    val total = ev.agg(
      expr("CAST(count(DISTINCT user_id) AS BIGINT)").as("n_units"))
    ev.groupBy("event_type")
      .agg(expr("CAST(count(DISTINCT user_id) AS BIGINT)").as("converters"))
      .crossJoin(broadcast(total))
      .selectExpr("event_type", "n_units", "converters",
        "CAST(converters AS DOUBLE) / CAST(n_units AS DOUBLE) AS p_raw",
        "CAST(n_units AS DOUBLE) / 2e0 AS n_arm")
      .selectExpr("event_type", "n_units", "converters",
        "round(p_raw, 6) + 0.0 AS p_hat",
        s"round(($Z975 + $Z80) * sqrt(2e0 * p_raw * (1e0 - p_raw) / n_arm), 6)" +
          " + 0.0 AS mde_abs",
        s"CAST(ceil(2e0 * ($Z975 + $Z80) * ($Z975 + $Z80) * p_raw * (1e0 - p_raw)" +
          " / nullif((5e-2 * p_raw) * (5e-2 * p_raw), 0e0)) AS BIGINT)" +
          " AS n_arm_5pct_lift")
  }

  /** DuckDB twin: identical exact counts, identical pinned-z chain. */
  val conversionPowerMdeSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type FROM events
       |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |total AS (
       |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_units FROM ev),
       |conv AS (
       |  SELECT event_type,
       |    CAST(count(DISTINCT user_id) AS BIGINT) AS converters
       |  FROM ev GROUP BY 1),
       |rates AS (
       |  SELECT event_type, n_units, converters,
       |    CAST(converters AS DOUBLE) / CAST(n_units AS DOUBLE) AS p_raw,
       |    CAST(n_units AS DOUBLE) / 2e0 AS n_arm
       |  FROM conv CROSS JOIN total)
       |SELECT event_type, n_units, converters,
       |  round(p_raw, 6) + 0.0 AS p_hat,
       |  round(($Z975 + $Z80) * sqrt(2e0 * p_raw * (1e0 - p_raw) / n_arm), 6)
       |    + 0.0 AS mde_abs,
       |  CAST(ceil(2e0 * ($Z975 + $Z80) * ($Z975 + $Z80) * p_raw * (1e0 - p_raw)
       |    / nullif((5e-2 * p_raw) * (5e-2 * p_raw), 0e0)) AS BIGINT)
       |    AS n_arm_5pct_lift
       |FROM rates""".stripMargin

  /** q132: are purchase-HEAVY users (purchase share above the 1/5
    * uniform-type expectation) equally common in the even and odd hash
    * buckets (they should be — an A/A sanity read; "ever purchased"
    * would saturate to 1.0 in this feed and degenerate the SE). */
  def purchaseRateTest(spark: SparkSession, dir: String): DataFrame =
    propZTest(
      Tables.events(spark, dir)
        .groupBy(col("user_id").as("u"))
        .agg(expr("CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase'" +
          " THEN 1 ELSE 0 END) > count(1) THEN 1 ELSE 0 END").as("conv")))

  val purchaseRateTestSql: String = {
    def p(z: String) = {
      val x = s"(abs($z) / 1.4142135623730951)"
      val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
      s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
        s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    }
    s"""WITH per_unit AS (
       |  SELECT user_id AS u,
       |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS bucket,
       |    CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase'
       |      THEN 1 ELSE 0 END) > count(*) THEN 1 ELSE 0 END AS conv
       |  FROM events GROUP BY 1, 2),
       |buckets AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(conv) AS BIGINT) AS x
       |  FROM per_unit GROUP BY 1),
       |wide AS (
       |  SELECT
       |    CAST(max(CASE WHEN bucket = 'A' THEN n END) AS BIGINT) AS n_a,
       |    CAST(max(CASE WHEN bucket = 'A' THEN x END) AS BIGINT) AS x_a,
       |    CAST(max(CASE WHEN bucket = 'B' THEN n END) AS BIGINT) AS n_b,
       |    CAST(max(CASE WHEN bucket = 'B' THEN x END) AS BIGINT) AS x_b
       |  FROM buckets),
       |props AS (
       |  SELECT *, CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
       |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
       |    CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
       |  FROM wide),
       |zed AS (
       |  SELECT n_a, x_a, n_b, x_b,
       |    round(pa, 6) + 0.0 AS p_a, round(pb, 6) + 0.0 AS p_b,
       |    round(pa - pb, 6) + 0.0 AS diff,
       |    round((pa - pb) / nullif(sqrt(pp * (1.0 - pp)
       |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0e0),
       |      4) + 0.0 AS z
       |  FROM props)
       |SELECT n_a, x_a, n_b, x_b, p_a, p_b, diff, z,
       |  round(${p("z")}, 6) + 0.0 AS p_value
       |FROM zed""".stripMargin
  }
}
