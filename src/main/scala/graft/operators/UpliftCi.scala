package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Bootstrap uplift CI — the interval on the DIFFERENCE of two arms,
  * which is the number an experiment actually ships: q96/q256 deliver
  * a verdict, q152's CUPED shrinks variance, q144 puts a CI on each
  * arm separately — but arm CIs overlapping says NOTHING about the
  * difference; the uplift needs its own resampling distribution.
  * Per Poisson resample b (the q144 threshold rule against the
  * hash48Seq family member u = hash48(Seed, b:key) — each row's
  * multiplicity a pure function of (key, b), bit-reproducible), the
  * statistic is diff_b = mean₁(b) − mean₀(b), and the CI is exact
  * order statistics over the ≤B diffs (q126 no-interpolation rule).
  * Resamples where EITHER arm drew zero mass drop (no diff exists;
  * counted via n_resamples).
  *
  * Exactness: per-(resample, arm) sums are exact integer cents
  * (conditional DECIMAL(38,0) aggregates — both arms in ONE pass,
  * never two); each diff is two shared-text divisions and one
  * subtraction of bit-identical doubles; bounds are elections, not
  * interpolations.
  *
  * Plan/scale: the q144 plan with a conditional-arm aggregate — one
  * scan → checkpoint → ×B sequence-explode → ONE map-side (g, b)
  * aggregate carrying 4 numbers → a B-bounded rank window → election.
  */
object UpliftCi {

  /** Hash family seed (hash48Seq member b ≡ hash48(Seed, b:key)). */
  val Seed = 257

  /** Per-group uplift CI from obs (g, s ∈ {0,1}, k unique row key,
    * xc exact cents): returns (g, n_x, n_y, n_resamples, diff_mean,
    * ci_lo, ci_hi) in dollars. */
  def upliftCi(obs: DataFrame, b: Int = Bootstrap.DefaultB,
      tailPermille: Int = 25): DataFrame = {
    require(b >= 40 && tailPermille > 0 && tailPermille < 500)
    val base = obs.filter("xc IS NOT NULL AND s IN (0, 1)")
      .localCheckpoint(true) // point + resamples share it
    val point = base.groupBy("g").agg(
      expr("CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("n0"),
      expr("CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("n1"),
      expr("CAST(sum(CASE WHEN s = 0 THEN CAST(xc AS DECIMAL(38,0))" +
        " ELSE 0 END) AS DECIMAL(38,0))").as("sx0"),
      expr("CAST(sum(CASE WHEN s = 1 THEN CAST(xc AS DECIMAL(38,0))" +
        " ELSE 0 END) AS DECIMAL(38,0))").as("sx1"))
    // ONE digest + one key encode per ROW for the whole ×B family
    // (the q150 posexplode idiom — 200 per-pair md5s per row read
    // 16.5 s at sf0.1; the fused family form is the difference
    // between the bootstrap being usable and not)
    val res = Bootstrap.spread(base)
      .select(col("g"), col("s"), col("xc"),
        posexplode(Hashing.hash48Seq(Seed, b, col("k").cast("string")))
          .as(Seq("b", "u")))
      .withColumn("w", expr(WSql))
      .groupBy("g", "b")
      .agg(
        expr("CAST(sum(CASE WHEN s = 0 THEN w ELSE 0 END) AS BIGINT)")
          .as("sw0"),
        expr("CAST(sum(CASE WHEN s = 1 THEN w ELSE 0 END) AS BIGINT)")
          .as("sw1"),
        // sum128: grouped sum(DECIMAL) costs ~5× a grouped long sum
        // (the q166 lesson) and this aggregate sees rows × B; w·xc is
        // Long-safe per row (w ≤ 8), the 128-bit limbs absorb any
        // group total
        expr("sum128(CASE WHEN s = 0 THEN CAST(w AS BIGINT) * xc" +
          " ELSE CAST(0 AS BIGINT) END)").as("swx0"),
        expr("sum128(CASE WHEN s = 1 THEN CAST(w AS BIGINT) * xc" +
          " ELSE CAST(0 AS BIGINT) END)").as("swx1"))
      .filter("sw0 > 0 AND sw1 > 0")
      .withColumn("d", expr("CAST(swx1 AS DOUBLE) / CAST(sw1 AS DOUBLE)" +
        " - CAST(swx0 AS DOUBLE) / CAST(sw0 AS DOUBLE)"))
    val wRank = Window.partitionBy("g").orderBy(col("d"), col("b"))
    val wAll = Window.partitionBy("g")
    res
      .withColumn("rn", row_number().over(wRank))
      .withColumn("bn", count(lit(1)).over(wAll))
      .groupBy("g")
      .agg(
        expr("CAST(max(bn) AS BIGINT)").as("n_resamples"),
        expr(s"min(CASE WHEN rn = CAST(($tailPermille * bn + 999) div 1000" +
          " AS BIGINT) THEN d END)").as("lo_d"),
        expr(s"min(CASE WHEN rn = CAST(((1000 - $tailPermille) * bn + 999)" +
          " div 1000 AS BIGINT) THEN d END)").as("hi_d"))
      .join(point, "g")
      .filter("n0 > 0 AND n1 > 0")
      .selectExpr("g", "n0 AS n_x", "n1 AS n_y", "n_resamples",
        "round((CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
          " - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 1e2, 4) + 0.0" +
          " AS diff_mean",
        "round(lo_d / 1e2, 4) + 0.0 AS ci_lo",
        "round(hi_d / 1e2, 4) + 0.0 AS ci_hi")
  }

  private val WSql: String =
    Bootstrap.Thresholds.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** q257: the F-vs-O order-value uplift per priority with its 95%
    * interval — the FOURTH lens on the shared q96/q194/q256 frame
    * (verdict, trimmed verdict, rank verdict — and now the effect
    * INTERVAL in dollars). */
  def orderValueUplift(spark: SparkSession, dir: String): DataFrame =
    upliftCi(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull
        && col("o_orderstatus").isin("F", "O")
        && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS s",
        "o_orderkey AS k",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS xc"))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical weights, conditional-arm sums, and
    * elections. */
  val orderValueUpliftSql: String = {
    val u = Hashing.hash48Sql(Seed, "(b)::VARCHAR || ':' || (k)::VARCHAR")
    val w = Bootstrap.Thresholds
      .map(t => s"(CASE WHEN ($u) >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    s"""WITH base AS (
       |  SELECT o_orderpriority AS g,
       |    CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS s,
       |    o_orderkey AS k,
       |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS xc
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IN ('F', 'O')
       |    AND o_totalprice IS NOT NULL),
       |point AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN s = 0 THEN CAST(xc AS HUGEINT) ELSE 0 END)
       |      AS HUGEINT) AS sx0,
       |    CAST(sum(CASE WHEN s = 1 THEN CAST(xc AS HUGEINT) ELSE 0 END)
       |      AS HUGEINT) AS sx1
       |  FROM base GROUP BY 1),
       |weighted AS (
       |  SELECT g, s, b.b, xc, $w AS w
       |  FROM base CROSS JOIN
       |    (SELECT unnest(range(0, ${Bootstrap.DefaultB})) AS b) b),
       |res AS (
       |  SELECT g, b,
       |    CAST(sum(CASE WHEN s = 0 THEN w ELSE 0 END) AS BIGINT) AS sw0,
       |    CAST(sum(CASE WHEN s = 1 THEN w ELSE 0 END) AS BIGINT) AS sw1,
       |    CAST(sum(CASE WHEN s = 0 THEN CAST(w AS HUGEINT) * xc ELSE 0 END)
       |      AS HUGEINT) AS swx0,
       |    CAST(sum(CASE WHEN s = 1 THEN CAST(w AS HUGEINT) * xc ELSE 0 END)
       |      AS HUGEINT) AS swx1
       |  FROM weighted GROUP BY 1, 2),
       |diffs AS (
       |  SELECT g, b, CAST(swx1 AS DOUBLE) / CAST(sw1 AS DOUBLE)
       |    - CAST(swx0 AS DOUBLE) / CAST(sw0 AS DOUBLE) AS d
       |  FROM res WHERE sw0 > 0 AND sw1 > 0),
       |ranked AS (
       |  SELECT g, d,
       |    row_number() OVER (PARTITION BY g ORDER BY d, b) AS rn,
       |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS bn
       |  FROM diffs),
       |ci AS (
       |  SELECT g, CAST(max(bn) AS BIGINT) AS n_resamples,
       |    min(CASE WHEN rn = CAST((25 * bn + 999) // 1000 AS BIGINT)
       |      THEN d END) AS lo_d,
       |    min(CASE WHEN rn = CAST((975 * bn + 999) // 1000 AS BIGINT)
       |      THEN d END) AS hi_d
       |  FROM ranked GROUP BY 1)
       |SELECT ci.g AS o_orderpriority, n0 AS n_x, n1 AS n_y, n_resamples,
       |  round((CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |    - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 1e2, 4) + 0.0
       |    AS diff_mean,
       |  round(lo_d / 1e2, 4) + 0.0 AS ci_lo,
       |  round(hi_d / 1e2, 4) + 0.0 AS ci_hi
       |FROM ci JOIN point ON ci.g = point.g
       |WHERE n0 > 0 AND n1 > 0""".stripMargin
  }
}
