package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Yuen's trimmed-mean t-test — the ROBUST companion of q96's Welch t:
  * one whale order in a priority class drags a mean-based t anywhere
  * (the q71 lesson applied to INFERENCE); Yuen compares 20%-trimmed
  * means with winsorized variances, so the test reads the bulk of the
  * two distributions instead of their tails.
  *
  *   t = (x̄ₜ₁ − x̄ₜ₂) / √(d₁ + d₂),  dᵢ = s²_wᵢ-numerator / (hᵢ(hᵢ−1))
  *
  * with h = n − 2g the trimmed count, g = ⌊0.2·n⌋, and the winsorized
  * sums replacing each trimmed tail by its clamp value x_(g+1) /
  * x_(n−g); Welch–Satterthwaite df on the d's.
  *
  * Exactness: trimming runs on VALUE CELLS — a cell straddling a trim
  * boundary keeps exactly m = max(0, min(cb+c, n−g) − max(cb, g)) of
  * its multiplicity (the q188 boundary-split move), the clamp values
  * are exact cell lookups (the cells containing positions g+1 and
  * n−g), and every winsorized sum Σm·v, Σm·v², g·x_clamp is an exact
  * BIGINT/DECIMAL(38,0) — the t/df pair is the only doubles, ONE
  * shared-text chain each.
  *
  * Plan/scale: the q97 sampleCells backbone unpivoted per side → one
  * banded cumulative walk over cells ([[BandedCumsum]] — cent-grid
  * price cells grow until the price RANGE saturates, which is large;
  * banding caps every in-band task at bandWidth rows absolutely) →
  * one keyed aggregate per (group, side) → conditional pivot to a row
  * per group. Row data never meets an unbounded window; side totals
  * are a dimension-grade aggregate broadcast back. */
object Yuen {

  /** Trim fraction denominator: g = n div 5 (= ⌊0.2n⌋ exactly). */
  val TrimDiv = 5L

  /** Yuen's t from a two-sided cell frame (g, v, cx, cy) — per
    * (group, distinct value) class counts (the q97 backbone shape).
    * Returns one row per group: (g, n_a, n_b, h_a, h_b, tmean_a,
    * tmean_b, t_yuen, df_yuen) — NULL t when either trimmed half is
    * degenerate. */
  def yuenFromCells(cells: DataFrame): DataFrame = {
    val sides = cells.selectExpr("g", "v", "'a' AS side", "cx AS c")
      .unionAll(cells.selectExpr("g", "v", "'b' AS side", "cy AS c"))
      .filter(col("c") > 0)
      .localCheckpoint(true) // feeds the banded walk AND the totals
    val totals = sides.groupBy("g", "side")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("n"))
    val walked = BandedCumsum.cumsum(sides, Seq("g", "side"), "v",
        Seq("c"), inputCheckpointed = true)
      .withColumn("cb", col("cum_c") - col("c"))
      .drop("cum_c")
      .join(broadcast(totals), Seq("g", "side"))
      .withColumn("gt", expr(s"n div $TrimDiv"))
      // kept multiplicity between positions gt+1 .. n-gt
      .withColumn("m", expr(
        "greatest(CAST(0 AS BIGINT)," +
          " least(cb + c, n - gt) - greatest(cb, gt))"))
    val perSide = walked.groupBy("g", "side")
      .agg(
        expr("CAST(max(n) AS BIGINT)").as("n"),
        expr("CAST(max(gt) AS BIGINT)").as("gt"),
        expr("CAST(sum(m) AS BIGINT)").as("h"),
        expr("CAST(sum(CAST(m AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))")
          .as("st"),
        expr("CAST(sum(CAST(m AS DECIMAL(38,0)) * v * v) AS DECIMAL(38,0))")
          .as("qt"),
        // clamp values: the cells holding positions gt+1 and n−gt
        expr("CAST(min(CASE WHEN cb < gt + 1 AND cb + c >= gt + 1" +
          " THEN v END) AS BIGINT)").as("xl"),
        expr("CAST(min(CASE WHEN cb < n - gt AND cb + c >= n - gt" +
          " THEN v END) AS BIGINT)").as("xh"))
      .selectExpr("g", "side", "n", "h", "st",
        "st + CAST(gt AS DECIMAL(38,0)) * (xl + xh) AS sw",
        "qt + CAST(gt AS DECIMAL(38,0))" +
          " * (CAST(xl AS DECIMAL(38,0)) * xl" +
          " + CAST(xh AS DECIMAL(38,0)) * xh) AS qw")
    perSide.groupBy("g")
      .agg(
        expr("CAST(max(CASE WHEN side = 'a' THEN n END) AS BIGINT)")
          .as("n_a"),
        expr("CAST(max(CASE WHEN side = 'b' THEN n END) AS BIGINT)")
          .as("n_b"),
        expr("CAST(max(CASE WHEN side = 'a' THEN h END) AS BIGINT)")
          .as("h_a"),
        expr("CAST(max(CASE WHEN side = 'b' THEN h END) AS BIGINT)")
          .as("h_b"),
        expr("CAST(max(CASE WHEN side = 'a' THEN st END) AS DECIMAL(38,0))")
          .as("st_a"),
        expr("CAST(max(CASE WHEN side = 'b' THEN st END) AS DECIMAL(38,0))")
          .as("st_b"),
        expr("CAST(max(CASE WHEN side = 'a' THEN sw END) AS DECIMAL(38,0))")
          .as("sw_a"),
        expr("CAST(max(CASE WHEN side = 'b' THEN sw END) AS DECIMAL(38,0))")
          .as("sw_b"),
        expr("CAST(max(CASE WHEN side = 'a' THEN qw END) AS DECIMAL(38,0))")
          .as("qw_a"),
        expr("CAST(max(CASE WHEN side = 'b' THEN qw END) AS DECIMAL(38,0))")
          .as("qw_b"))
      .selectExpr("g", "n_a", "n_b", "h_a", "h_b",
        s"round(${tmSql("a")}, 4) + 0.0 AS tmean_a",
        s"round(${tmSql("b")}, 4) + 0.0 AS tmean_b",
        s"${dSql("a")} AS d_a", s"${dSql("b")} AS d_b",
        s"${tmSql("a")} - ${tmSql("b")} AS tdiff")
      .selectExpr("g", "n_a", "n_b", "h_a", "h_b", "tmean_a", "tmean_b",
        "round(tdiff / nullif(sqrt(d_a + d_b), 0.0), 4) + 0.0 AS t_yuen",
        "round((d_a + d_b) * (d_a + d_b)" +
          " / nullif(d_a * d_a / nullif(CAST(h_a AS DOUBLE) - 1.0, 0.0)" +
          " + d_b * d_b / nullif(CAST(h_b AS DOUBLE) - 1.0, 0.0), 0.0), 4)" +
          " + 0.0 AS df_yuen")
  }

  /** Trimmed mean of one side — exact-integer numerator. */
  private def tmSql(s: String) =
    s"(CAST(st_$s AS DOUBLE) / nullif(CAST(h_$s AS DOUBLE), 0.0))"

  /** dᵢ = (q_w − s_w²/n)/(h(h−1)) — the winsorized-variance SE term. */
  private def dSql(s: String) =
    s"((CAST(qw_$s AS DOUBLE) - CAST(sw_$s AS DOUBLE)" +
      s" * CAST(sw_$s AS DOUBLE) / CAST(n_$s AS DOUBLE))" +
      s" / nullif(CAST(h_$s AS DOUBLE)" +
      s" * (CAST(h_$s AS DOUBLE) - 1.0), 0.0))"

  /** q194: the q96 question asked robustly — do finished ('F') and
    * open ('O') orders differ in value per priority, once each class's
    * top/bottom 20% whales and minnows are trimmed? Cent grid. */
  def orderYuenTest(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("F", "O")
        && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g", "o_orderstatus AS cls",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS v")
      .groupBy("g", "v")
      .agg(
        expr("CAST(sum(CASE WHEN cls = 'F' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cx"),
        expr("CAST(sum(CASE WHEN cls = 'O' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cy"))
    yuenFromCells(cells).withColumnRenamed("g", "o_orderpriority")
  }

  /** DuckDB twin: identical cells, boundary splits, clamps, chain. */
  val orderYuenTestSql: String =
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS v,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cy
       |  FROM orders
       |  WHERE o_orderstatus IN ('F', 'O') AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |sides AS (
       |  SELECT g, v, 'a' AS side, cx AS c FROM cells WHERE cx > 0
       |  UNION ALL
       |  SELECT g, v, 'b' AS side, cy AS c FROM cells WHERE cy > 0),
       |walked AS (
       |  SELECT *,
       |    coalesce(CAST(sum(c) OVER (PARTITION BY g, side ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cb,
       |    CAST(sum(c) OVER (PARTITION BY g, side) AS BIGINT) AS n
       |  FROM sides),
       |marked AS (
       |  SELECT *, n // $TrimDiv AS gt,
       |    greatest(CAST(0 AS BIGINT),
       |      least(cb + c, n - n // $TrimDiv)
       |      - greatest(cb, n // $TrimDiv)) AS m
       |  FROM walked),
       |per_side0 AS (
       |  SELECT g, side,
       |    CAST(max(n) AS BIGINT) AS n, CAST(max(gt) AS BIGINT) AS gt,
       |    CAST(sum(m) AS BIGINT) AS h,
       |    CAST(sum(CAST(m AS HUGEINT) * v) AS HUGEINT) AS st,
       |    CAST(sum(CAST(m AS HUGEINT) * v * v) AS HUGEINT) AS qt,
       |    CAST(min(CASE WHEN cb < gt + 1 AND cb + c >= gt + 1
       |      THEN v END) AS BIGINT) AS xl,
       |    CAST(min(CASE WHEN cb < n - gt AND cb + c >= n - gt
       |      THEN v END) AS BIGINT) AS xh
       |  FROM marked GROUP BY 1, 2),
       |per_side AS (
       |  SELECT g, side, n, h, st,
       |    st + CAST(gt AS HUGEINT) * (xl + xh) AS sw,
       |    qt + CAST(gt AS HUGEINT)
       |      * (CAST(xl AS HUGEINT) * xl + CAST(xh AS HUGEINT) * xh) AS qw
       |  FROM per_side0),
       |pivoted AS (
       |  SELECT g,
       |    CAST(max(CASE WHEN side = 'a' THEN n END) AS BIGINT) AS n_a,
       |    CAST(max(CASE WHEN side = 'b' THEN n END) AS BIGINT) AS n_b,
       |    CAST(max(CASE WHEN side = 'a' THEN h END) AS BIGINT) AS h_a,
       |    CAST(max(CASE WHEN side = 'b' THEN h END) AS BIGINT) AS h_b,
       |    CAST(max(CASE WHEN side = 'a' THEN st END) AS HUGEINT) AS st_a,
       |    CAST(max(CASE WHEN side = 'b' THEN st END) AS HUGEINT) AS st_b,
       |    CAST(max(CASE WHEN side = 'a' THEN sw END) AS HUGEINT) AS sw_a,
       |    CAST(max(CASE WHEN side = 'b' THEN sw END) AS HUGEINT) AS sw_b,
       |    CAST(max(CASE WHEN side = 'a' THEN qw END) AS HUGEINT) AS qw_a,
       |    CAST(max(CASE WHEN side = 'b' THEN qw END) AS HUGEINT) AS qw_b
       |  FROM per_side GROUP BY 1),
       |finish AS (
       |  SELECT g, n_a, n_b, h_a, h_b,
       |    round(${tmSql("a")}, 4) + 0.0 AS tmean_a,
       |    round(${tmSql("b")}, 4) + 0.0 AS tmean_b,
       |    ${dSql("a")} AS d_a, ${dSql("b")} AS d_b,
       |    ${tmSql("a")} - ${tmSql("b")} AS tdiff
       |  FROM pivoted)
       |SELECT g AS o_orderpriority, n_a, n_b, h_a, h_b, tmean_a, tmean_b,
       |  round(tdiff / nullif(sqrt(d_a + d_b), 0.0), 4) + 0.0 AS t_yuen,
       |  round((d_a + d_b) * (d_a + d_b)
       |    / nullif(d_a * d_a / nullif(CAST(h_a AS DOUBLE) - 1.0, 0.0)
       |    + d_b * d_b / nullif(CAST(h_b AS DOUBLE) - 1.0, 0.0), 0.0), 4)
       |  + 0.0 AS df_yuen
       |FROM finish""".stripMargin
}
