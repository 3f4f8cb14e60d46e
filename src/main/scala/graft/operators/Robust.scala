package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Robust outlier detection via Median Absolute Deviation — the
  * resistant alternative to q8's z-score (one corrupt batch of
  * scraped numbers shifts a mean/stddev fence arbitrarily; the MAD
  * fence moves only if half the data moves). The standard rule:
  * outlier ⟺ |x − median| > k · 1.4826 · MAD (1.4826 ≈ consistency
  * constant for normal data, k = 3).
  *
  * EXACTNESS: interpolated medians of doubles are the one statistic
  * the §5 rules can't snap safely (Spark's `(1−d)·a + d·b` vs
  * DuckDB's `a + d·(b−a)` can differ in the last ulp). Solution:
  * operate on 2× integer cents — `CAST(round(x·100) AS BIGINT) * 2`.
  * Midpoints of even integers are computed EXACTLY by both engines'
  * interpolation formulas (every intermediate is an exact double), so
  * medians, deviations, and MADs are bit-identical with no rounding
  * anywhere before the display columns.
  *
  * Plan: two keyed aggregates (median fit, MAD fit) + one broadcast
  * join of the dimension-grade per-group medians + a final counting
  * aggregate. The exact `percentile` buffers each group's values —
  * fine for dimension-grade groups; swap in `approx_percentile`
  * ([[Relational.percentilesApprox]] / s3 precedent) for fact-scale
  * groups — the plan shape is unchanged.
  */
object Robust {

  /** Outlier fence multiplier (k · consistency constant). */
  val FenceSql = "3 * 1.4826"

  /** q71: per-segment robust stats over customer balances:
    * (segment, n_rows, med, mad, n_outliers). */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val x2 = customerCents(Tables.customer(spark, dir))
    val med = x2.groupBy("segment")
      .agg(expr("percentile(x2, 0.5)").as("med2"))
    val dev = x2.join(broadcast(med), "segment")
      .withColumn("dev2", abs(col("x2") - col("med2")))
    val mad = dev.groupBy("segment")
      .agg(expr("percentile(dev2, 0.5)").as("mad2"))
    dev.join(broadcast(mad), "segment")
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_rows"),
        (round(max(col("med2")) / 200, 4) + 0.0).as("med"),
        (round(max(col("mad2")) / 200, 4) + 0.0).as("mad"),
        sum(expr(s"CASE WHEN dev2 > $FenceSql * mad2 THEN 1 ELSE 0 END"))
          .cast("long").as("n_outliers"))
  }

  /** 2× integer cents of the balance (exact-median input form). */
  private def customerCents(customer: DataFrame): DataFrame =
    customer.selectExpr("c_mktsegment AS segment",
      "CAST(round(c_acctbal * 100) AS BIGINT) * 2 AS x2")

  val madOutliersSql: String =
    s"""WITH x AS (
       |  SELECT c_mktsegment AS segment,
       |    CAST(round(c_acctbal * 100) AS BIGINT) * 2 AS x2
       |  FROM customer),
       |med AS (
       |  SELECT segment, quantile_cont(x2, 0.5) AS med2 FROM x GROUP BY 1),
       |dev AS (
       |  SELECT x.segment, abs(x.x2 - m.med2) AS dev2, m.med2
       |  FROM x JOIN med m USING (segment)),
       |mad AS (
       |  SELECT segment, quantile_cont(dev2, 0.5) AS mad2 FROM dev GROUP BY 1)
       |SELECT d.segment, count(*) AS n_rows,
       |  round(max(d.med2) / 200, 4) + 0.0 AS med,
       |  round(max(m.mad2) / 200, 4) + 0.0 AS mad,
       |  CAST(sum(CASE WHEN d.dev2 > $FenceSql * m.mad2 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_outliers
       |FROM dev d JOIN mad m USING (segment)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- Theil–Sen

  /** Theil–Sen robust line fit per group: slope = weighted LOWER
    * median of the pairwise slopes (y_j−y_i)/(x_j−x_i) over x-distinct
    * point pairs, intercept = weighted lower median of the residuals
    * y − m·x. The resistant alternative to q32's least squares — up to
    * ~29% of the rows can be arbitrarily corrupt before the fit moves
    * (the breakdown point the reference's scraped vote counts would
    * want), where one bad row already owns an OLS slope.
    *
    * Value-level formulation (the q101 cell-grid trick): points
    * collapse to cells (g, vx, vy, cnt); pair slopes live on the
    * CELL-PAIR grid with weight cnt_i·cnt_j (decimal-first, exact past
    * 2^31-row cells), so the pair "explosion" is quadratic in value
    * cardinality, never in rows. The weighted median is the smallest
    * value whose doubled cumulative weight reaches the total — an
    * integer comparison, so the pick is exact; the slope itself is ONE
    * shared-text IEEE division, bit-identical cross-engine.
    *
    * NULL convention: a group whose x is constant has no pair slopes →
    * slope and intercept NULL (nullif-free — the join back is simply
    * empty and the left join leaves NULLs).
    *
    * Plan: one fact scan → cell aggregate (localCheckpointed, reused
    * by the slope and residual paths) → per-group cell self-join +
    * two cardinality-bounded windows partitioned by g. Precondition:
    * |cells|² per group must be dimension-grade — quantize continuous
    * columns first (q47) at 100 TB; since r10 the precondition is
    * ENFORCED: a CellGuard raise_error fires when the slope-cell
    * frame a group's window must swallow exceeds maxCells. */
  def theilSen(df: DataFrame, groupCol: String, xCol: String,
      yCol: String,
      maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(xCol).as("vx"), col(yCol).as("vy"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // value-level; reused by slope + residual paths
    val c1 = cells.select(col("g"), col("vx").as("vx1"), col("vy").as("vy1"),
      col("cnt").as("n1"))
    val c2 = cells.select(col("g").as("g2"), col("vx").as("vx2"),
      col("vy").as("vy2"), col("cnt").as("n2"))
    val cum = Window.partitionBy("g").orderBy("slope")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("g")
    val slopes = c1.join(c2, col("g") === col("g2") && col("vx1") < col("vx2"))
      .select(col("g"), expr("(vy2 - vy1) / (vx2 - vx1)").as("slope"),
        expr("CAST(n1 AS DECIMAL(38,0)) * n2").as("w"))
      .groupBy("g", "slope")
      .agg(expr("CAST(sum(w) AS DECIMAL(38,0))").as("w"))
    val mFit = slopes
      .withColumn("cum", sum("w").over(cum))
      .withColumn("wtot", sum("w").over(tot))
      // guard shares the whole-partition spec — no extra pass
      .withColumn("n_cells", count(lit(1)).over(tot))
      .filter(expr(CellGuard.sqlGuard("theilSen", "n_cells", maxCells)))
      .filter(expr("2 * cum >= wtot"))
      .groupBy("g").agg(min("slope").as("m"))
    val rcum = Window.partitionBy("g").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bFit = cells.join(mFit, Seq("g"))
      .select(col("g"), expr("vy - m * vx").as("r"), col("cnt"))
      .groupBy("g", "r").agg(expr("CAST(sum(cnt) AS BIGINT)").as("w"))
      .withColumn("cum", sum("w").over(rcum))
      .withColumn("wtot", sum("w").over(tot))
      .filter(expr("2 * cum >= wtot"))
      .groupBy("g").agg(min("r").as("b"))
    cells.groupBy("g").agg(expr("CAST(sum(cnt) AS BIGINT)").as("n_rows"))
      .join(mFit, Seq("g"), "left").join(bFit, Seq("g"), "left")
      .selectExpr(s"g AS $groupCol", "n_rows",
        "round(m, 6) + 0.0 AS slope", "round(b, 6) + 0.0 AS intercept")
  }

  /** Theil–Sen slope with Sen's (1968) distribution-free confidence
    * band (r15 verdict #8 — "Theil–Sen bands beside q102"): with N =
    * total pair weight and V = Kendall's variance
    * (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18 over the x-tie groups t, the
    * band's endpoints are the k₁-th and k₂-th smallest pair slopes,
    * k₁ = max(1, ⌊(N − z√V)/2⌋ + 1) and k₂ = ⌈(N + z√V)/2⌉ clamped to
    * N — order-statistic picks on the SAME weighted slope grid the
    * point estimate uses, so the band costs two more cumulative-weight
    * window picks, not a second pair pass. Convention notes (mirrored
    * verbatim in the oracle): z = 1.96; tie correction over x-value
    * groups only; a group with constant x has no slopes → NULL row
    * (the q102 contract).
    *
    * Integer discipline: N and the variance polynomial ride
    * DECIMAL(38,0) (HUGEINT in the twin — the q102 pairing); the only
    * doubles are the shared-text √V and the final slope values. */
  def theilSenCi(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(xCol).as("vx"), col(yCol).as("vy"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true)
    val c1 = cells.select(col("g"), col("vx").as("vx1"), col("vy").as("vy1"),
      col("cnt").as("n1"))
    val c2 = cells.select(col("g").as("g2"), col("vx").as("vx2"),
      col("vy").as("vy2"), col("cnt").as("n2"))
    val cum = Window.partitionBy("g").orderBy("slope")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("g")
    val slopes = c1.join(c2, col("g") === col("g2") && col("vx1") < col("vx2"))
      .select(col("g"), expr("(vy2 - vy1) / (vx2 - vx1)").as("slope"),
        expr("CAST(n1 AS DECIMAL(38,0)) * n2").as("w"))
      .groupBy("g", "slope")
      .agg(expr("CAST(sum(w) AS DECIMAL(38,0))").as("w"))
      .withColumn("cum", sum("w").over(cum))
      .withColumn("wtot", sum("w").over(tot))
      .withColumn("n_cells", count(lit(1)).over(tot))
      .filter(expr(CellGuard.sqlGuard("theilSenCi", "n_cells", maxCells)))
      .localCheckpoint(true) // three order-statistic picks ride it
    // per-group Kendall variance with x-tie correction
    val xTies = cells.groupBy("g", "vx")
      .agg(expr("CAST(sum(cnt) AS DECIMAL(38,0))").as("t"))
    val stats = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt) AS DECIMAL(38,0))").as("n"),
        expr("CAST(sum(cnt) AS BIGINT)").as("n_rows"))
      .join(xTies.groupBy("g")
        .agg(expr("CAST(sum(t * (t - 1) * (2 * t + 5)) AS DECIMAL(38,0))").as("tie_poly")),
        Seq("g"))
      .selectExpr("g", "n_rows",
        "CAST((n * (n - 1) * (2 * n + 5) - tie_poly) AS DOUBLE) / 18.0 AS vk")
      .selectExpr("g", "n_rows", "1.96 * sqrt(vk) AS cz")
    val ranked = slopes.join(stats.select("g", "cz"), Seq("g"))
      .withColumn("k1", expr(
        "greatest(CAST(1 AS BIGINT), CAST(floor((CAST(wtot AS DOUBLE) - cz) / 2.0) AS BIGINT) + 1)"))
      .withColumn("k2", expr(
        "CAST(ceil((CAST(wtot AS DOUBLE) + cz) / 2.0) AS BIGINT)"))
    def pick(cond: String, as: String): DataFrame = ranked
      .filter(expr(cond)).groupBy("g").agg(min("slope").as(as))
    val mFit = pick("2 * cum >= wtot", "m")
    val loFit = pick("cum >= k1", "lo")
    val hiFit = pick("cum >= least(CAST(k2 AS DECIMAL(38,0)), wtot)", "hi")
    stats.select("g", "n_rows")
      .join(mFit, Seq("g"), "left")
      .join(loFit, Seq("g"), "left")
      .join(hiFit, Seq("g"), "left")
      .selectExpr(s"g AS $groupCol", "n_rows",
        "round(m, 6) + 0.0 AS slope",
        "round(lo, 6) + 0.0 AS slope_lo",
        "round(hi, 6) + 0.0 AS slope_hi")
  }

  /** q322: the q102 fit with its Sen confidence band. */
  def lineitemTheilSenCi(spark: SparkSession, dir: String): DataFrame =
    theilSenCi(
      Tables.lineitem(spark, dir)
        .withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_quantity", "l_discount")

  /** DuckDB twin of [[lineitemTheilSenCi]]: identical cell grid,
    * HUGEINT weight/variance polynomials, shared order-statistic
    * picks. */
  val lineitemTheilSenCiSql: String =
    s"""WITH cells AS (
       |  SELECT CAST(year(l_shipdate) AS INTEGER) AS g, l_quantity AS vx,
       |    l_discount AS vy, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem
       |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |slopes AS (
       |  SELECT g, slope,
       |    sum(w) OVER (PARTITION BY g ORDER BY slope
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(w) OVER (PARTITION BY g) AS wtot
       |  FROM (
       |    SELECT c1.g, (c2.vy - c1.vy) / (c2.vx - c1.vx) AS slope,
       |      CAST(sum(CAST(c1.cnt AS HUGEINT) * c2.cnt) AS HUGEINT) AS w
       |    FROM cells c1 JOIN cells c2 ON c1.g = c2.g AND c1.vx < c2.vx
       |    GROUP BY 1, 2)),
       |stats AS (
       |  SELECT n.g, n.n_rows,
       |    1.96 * sqrt(CAST((n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_poly)
       |      AS DOUBLE) / 18.0) AS cz
       |  FROM (SELECT g, CAST(sum(cnt) AS HUGEINT) AS n,
       |          CAST(sum(cnt) AS BIGINT) AS n_rows
       |        FROM cells GROUP BY 1) n
       |  JOIN (SELECT g, CAST(sum(t * (t - 1) * (2 * t + 5)) AS HUGEINT) AS tie_poly
       |        FROM (SELECT g, vx, CAST(sum(cnt) AS HUGEINT) AS t
       |              FROM cells GROUP BY 1, 2) GROUP BY 1) t
       |    ON n.g = t.g),
       |ranked AS (
       |  SELECT s.*,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(floor((CAST(wtot AS DOUBLE) - cz) / 2.0) AS BIGINT) + 1) AS k1,
       |    CAST(ceil((CAST(wtot AS DOUBLE) + cz) / 2.0) AS BIGINT) AS k2
       |  FROM slopes s JOIN stats ON s.g = stats.g),
       |mfit AS (SELECT g, min(slope) AS m FROM ranked WHERE 2 * cum >= wtot GROUP BY 1),
       |lofit AS (SELECT g, min(slope) AS lo FROM ranked WHERE cum >= k1 GROUP BY 1),
       |hifit AS (SELECT g, min(slope) AS hi FROM ranked
       |          WHERE cum >= least(CAST(k2 AS HUGEINT), wtot) GROUP BY 1)
       |SELECT stats.g AS ship_yr, stats.n_rows,
       |  round(mfit.m, 6) + 0.0 AS slope,
       |  round(lofit.lo, 6) + 0.0 AS slope_lo,
       |  round(hifit.hi, 6) + 0.0 AS slope_hi
       |FROM stats
       |LEFT JOIN mfit ON stats.g = mfit.g
       |LEFT JOIN lofit ON stats.g = lofit.g
       |LEFT JOIN hifit ON stats.g = hifit.g""".stripMargin

  /** q102: robust discount-vs-quantity line per ship year — the
    * outlier-proof twin of what q32 fits by least squares. */
  def lineitemTheilSen(spark: SparkSession, dir: String): DataFrame =
    theilSen(
      Tables.lineitem(spark, dir)
        .withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_quantity", "l_discount")

  /** DuckDB twin: same cell grid, same exact weighted-median picks
    * (HUGEINT weights mirror Spark's decimal-first products), same
    * shared slope/residual division text. */
  val lineitemTheilSenSql: String =
    s"""WITH cells AS (
       |  SELECT CAST(year(l_shipdate) AS INTEGER) AS g, l_quantity AS vx,
       |    l_discount AS vy, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem
       |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |slopes AS (
       |  SELECT c1.g, (c2.vy - c1.vy) / (c2.vx - c1.vx) AS slope,
       |    CAST(sum(CAST(c1.cnt AS HUGEINT) * c2.cnt) AS HUGEINT) AS w
       |  FROM cells c1 JOIN cells c2 ON c1.g = c2.g AND c1.vx < c2.vx
       |  GROUP BY 1, 2),
       |mfit AS (
       |  SELECT g, min(slope) AS m FROM (
       |    SELECT g, slope,
       |      sum(w) OVER (PARTITION BY g ORDER BY slope
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      sum(w) OVER (PARTITION BY g) AS wtot
       |    FROM slopes)
       |  WHERE 2 * cum >= wtot GROUP BY 1),
       |resid AS (
       |  SELECT cells.g, vy - m * vx AS r, CAST(sum(cnt) AS BIGINT) AS w
       |  FROM cells JOIN mfit ON cells.g = mfit.g
       |  GROUP BY 1, 2),
       |bfit AS (
       |  SELECT g, min(r) AS b FROM (
       |    SELECT g, r,
       |      sum(w) OVER (PARTITION BY g ORDER BY r
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      sum(w) OVER (PARTITION BY g) AS wtot
       |    FROM resid)
       |  WHERE 2 * cum >= wtot GROUP BY 1)
       |SELECT n.g AS ship_yr, n.n_rows,
       |  round(mfit.m, 6) + 0.0 AS slope,
       |  round(bfit.b, 6) + 0.0 AS intercept
       |FROM (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_rows
       |      FROM cells GROUP BY 1) n
       |LEFT JOIN mfit ON n.g = mfit.g
       |LEFT JOIN bfit ON n.g = bfit.g""".stripMargin
}
