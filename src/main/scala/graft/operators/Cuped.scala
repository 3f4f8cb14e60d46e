package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** CUPED variance reduction (Deng et al. 2013, "Improving the
  * Sensitivity of Online Controlled Experiments") — the standard
  * experimentation-platform adjustment: subtract θ·(x − x̄) from each
  * unit's metric, θ = cov(x, y)/var(x) with x a PRE-period covariate,
  * and the treatment-effect estimate keeps its mean but loses
  * ρ²(x, y) of its variance — the same lift at a fraction of the
  * sample. Composes with q96/q132/q150 as the sensitivity layer of
  * the experimentation stack.
  *
  * Key algebraic shape (what makes it one aggregate): the
  * CUPED-adjusted mean difference equals
  *   (ȳ_t − ȳ_c) − θ·(x̄_t − x̄_c)
  * so the whole readout derives from exact per-arm integer sums — no
  * per-row adjusted values, no second pass. θ and ρ² come from pooled
  * (n, Σx, Σy, Σxy, Σx², Σy²) carried as DECIMAL(38,0) (cent
  * products overflow BIGINT); each reported number is ONE shared-text
  * double expression over those integers.
  *
  * Determinism: units split 50/50 by seeded hash48 (the q38
  * discipline); pre/post periods are even/odd epoch days — both pure
  * functions of the row, reproduced exactly by the oracle.
  *
  * Plan/scale: one scan → per-user (x, y) cents (ONE map-side-combined
  * aggregate) → one 6-number pooled aggregate + one 4-number per-arm
  * aggregate → a 1-row join. Nothing corpus-sized concentrates.
  */
object Cuped {

  /** Assignment seed (hash48 family member). */
  val Seed = 152

  private val ThetaNum = "CAST(n * sxy - sx * sy AS DOUBLE)"
  private val ThetaDen = "CAST(n * sxx - sx * sx AS DOUBLE)"
  private val ThetaSql = s"($ThetaNum / $ThetaDen)"
  /** ρ² = corr²(x, y): the fraction of metric variance CUPED removes.
    * Double products — the DECIMAL(38) squares would overflow. */
  private val Rho2Sql =
    s"(($ThetaNum) * ($ThetaNum)) / (($ThetaDen) * CAST(n * syy - sy * sy AS DOUBLE))"
  private val DiffRawSql =
    "(CAST(syt AS DOUBLE) / nt - CAST(syc AS DOUBLE) / nc) / 100.0"
  private val DiffXSql =
    "(CAST(sxt AS DOUBLE) / nt - CAST(sxc AS DOUBLE) / nc) / 100.0"

  /** q152: CUPED-adjusted treatment effect on per-user odd-day event
    * value, covariate = the user's even-day value. */
  def eventValueCuped(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .selectExpr("user_id",
        "CAST(floor(value * 100.0) AS BIGINT) AS vc",
        "datediff(CAST(ts AS DATE), DATE'1970-01-01') % 2 AS odd")
      .groupBy("user_id")
      .agg(sum(expr("CASE WHEN odd = 0 THEN vc ELSE 0 END")).as("x"),
        sum(expr("CASE WHEN odd = 1 THEN vc ELSE 0 END")).as("y"))
      .withColumn("t",
        (Hashing.hash48(Seed, col("user_id").cast("string")) % 2).cast("int"))
      .localCheckpoint(true) // pooled + per-arm aggregates read it
    val pooled = users.agg(
      count(lit(1)).cast("long").as("n"),
      sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
    val arms = users.agg(
      sum(col("t")).cast("long").as("nt"),
      sum(expr("CASE WHEN t = 1 THEN y ELSE 0 END")).as("syt"),
      sum(expr("CASE WHEN t = 1 THEN x ELSE 0 END")).as("sxt"),
      sum(expr("1 - t")).cast("long").as("nc"),
      sum(expr("CASE WHEN t = 0 THEN y ELSE 0 END")).as("syc"),
      sum(expr("CASE WHEN t = 0 THEN x ELSE 0 END")).as("sxc"))
    pooled.crossJoin(arms)
      .selectExpr("nt AS n_treat", "nc AS n_ctrl",
        s"round($ThetaSql, 6) + 0.0 AS theta",
        s"round($DiffRawSql, 4) + 0.0 AS diff_raw",
        s"round($DiffRawSql - $ThetaSql * $DiffXSql, 4) + 0.0 AS diff_cuped",
        s"round($Rho2Sql, 6) + 0.0 AS rho2")
  }

  /** DuckDB twin: identical day parity, hash split, DECIMAL sums,
    * shared formula text. */
  val eventValueCupedSql: String = {
    s"""WITH u AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN odd = 0 THEN vc ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN odd = 1 THEN vc ELSE 0 END) AS BIGINT) AS y
       |  FROM (
       |    SELECT user_id, CAST(floor(value * 100.0) AS BIGINT) AS vc,
       |      date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 2 AS odd
       |    FROM events
       |    WHERE value IS NOT NULL AND user_id IS NOT NULL)
       |  GROUP BY 1),
       |ut AS (
       |  SELECT *, CAST(${Hashing.hash48Sql(Seed, "(user_id)::VARCHAR")} % 2
       |    AS INT) AS t
       |  FROM u),
       |pooled AS (
       |  -- HUGEINT where Spark carries DECIMAL(38,0): DuckDB's decimal
       |  -- multiply widens past 38 and errors, INT128 holds the same
       |  -- exact integers (the q143 var18 convention)
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
       |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
       |  FROM ut),
       |arms AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS nt,
       |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
       |    CAST(sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS BIGINT) AS sxt,
       |    CAST(sum(1 - t) AS BIGINT) AS nc,
       |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc,
       |    CAST(sum(CASE WHEN t = 0 THEN x ELSE 0 END) AS BIGINT) AS sxc
       |  FROM ut)
       |SELECT nt AS n_treat, nc AS n_ctrl,
       |  round($ThetaSql, 6) + 0.0 AS theta,
       |  round($DiffRawSql, 4) + 0.0 AS diff_raw,
       |  round($DiffRawSql - $ThetaSql * $DiffXSql, 4) + 0.0 AS diff_cuped,
       |  round($Rho2Sql, 6) + 0.0 AS rho2
       |FROM pooled CROSS JOIN arms""".stripMargin
  }
}
