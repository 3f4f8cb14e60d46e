package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Classical additive seasonal decomposition on a regular daily spine
  * — x_t = TREND + SEASONAL + REMAINDER, the decomposition itself
  * rather than its summaries: q127 prints the weekly SHAPE (cell
  * means), q139 scores how load-bearing the cycle is (η²), but
  * neither separates the slow level from the cycle — a series whose
  * Sundays "run hot" in q127 may just have trended upward across a
  * Sunday-heavy span. The moving-average detrend is what makes the
  * seasonal estimate trend-proof (the textbook decompose() procedure;
  * STL's LOESS variant refines the same skeleton).
  *
  * Semantics, per series g on daily cells x_t (integer cents):
  * trend_t = centered 7-day moving average (defined where all 7
  * neighbors exist — series edges yield no trend row, the textbook
  * convention); detrended = x − trend; seasonal s_d = mean of
  * detrended by day-of-week d ((epoch_days+4) mod 7, q127's integer
  * convention), CENTERED so Σ_d s_d = 0; remainder = detrended − s_d.
  * Output one row per series: n_days (trend-defined days), level
  * (mean of x over those days), s0..s6 (centered seasonal, dollars),
  * remainder_rms.
  *
  * Exactness: the trend never becomes a lone double — detrended
  * carries as det7 = 7·x − Σ₇x (exact BIGINT); per-dow means snap to
  * a 1e-4-cent grid BEFORE the cross-dow sum (integer Σ over the 7
  * snapped values — the q139 snap-then-sum rule, since a double Σ is
  * add-order-dependent); remainders snap to the same grid and their
  * squares sum in DECIMAL(38,0). Every remaining double op is a
  * shared-text single division/sqrt off exact integers.
  *
  * Plan/scale: ONE fact scan → calendar-bounded day cells (≤ years ×
  * 366 rows per series); the ±3-row window, the dow cells, and the
  * remainder join all run on that day spine — the q115/q216
  * calendar-cell class, absolutely bounded regardless of fact rows. */
object Decompose {

  /** Half-window (±3 days = the 7-day centered MA). */
  val Half = 3

  /** Classical weekly decomposition over day cells (g, t, x):
    * epoch-day integer t, integer-cent value x. */
  def weeklyDecompose(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy("t")
      .rowsBetween(-Half, Half)
    // det7 = 7x − Σ₇x: the detrended value scaled by 7, exact BIGINT
    val trended = cells
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("s7", sum(col("x")).over(w))
      .filter(col("n7") === (2 * Half + 1))
      .selectExpr("g", "t", "x", "(t + 4) % 7 AS dow",
        "7 * x - s7 AS det7")
    // per-(g, dow): day count, Σdet7, Σx — then the dow mean snapped
    // to the 1e-4-cent grid so the cross-dow centering sum is integer
    val dowCells = trended
      .groupBy("g", "dow")
      .agg(expr("CAST(count(1) AS BIGINT)").as("nd"),
        expr("CAST(sum(det7) AS BIGINT)").as("sd7"),
        expr("CAST(sum(x) AS BIGINT)").as("sxd"))
      .withColumn("sr",
        expr("CAST(floor(CAST(sd7 AS DOUBLE) / CAST(nd AS DOUBLE) / 7.0" +
          " * 1e4 + 0.5) AS BIGINT)"))
    val perG = dowCells.groupBy("g")
      .agg(expr("CAST(sum(nd) AS BIGINT)").as("n_days"),
        expr("CAST(sum(sxd) AS BIGINT)").as("sx"),
        expr("CAST(sum(sr) AS BIGINT)").as("tot_sr"),
        expr("CAST(count(1) AS BIGINT)").as("n_dows"))
    // centered seasonal (cents): sr/1e4 − tot_sr/(n_dows·1e4) — both
    // terms single divisions off exact integers
    val seasonal = dowCells.join(perG, "g")
      .selectExpr("g", "dow", "sr", "tot_sr", "n_dows")
      .withColumn("s_cents",
        expr("CAST(sr AS DOUBLE) / 1e4 - CAST(tot_sr AS DOUBLE)" +
          " / (CAST(n_dows AS DOUBLE) * 1e4)"))
    // remainder pass over the day spine: R = det7/7 − s_d, snapped to
    // the same grid; Σr² exact in DECIMAL
    val rms = trended
      .join(broadcast(seasonal.select("g", "dow", "s_cents")), Seq("g", "dow"))
      .withColumn("ri",
        expr("CAST(floor((CAST(det7 AS DOUBLE) / 7.0 - s_cents) * 1e4" +
          " + 0.5) AS BIGINT)"))
      .groupBy("g")
      .agg(expr("CAST(sum(CAST(ri AS DECIMAL(38,0)) * ri) AS DECIMAL(38,0))")
        .as("qr"))
    val sWide = (0 to 6).map(d =>
      expr(s"round(max(CASE WHEN dow = $d THEN s_cents END) / 1e2, 4)" +
        " + 0.0").as(s"s$d"))
    seasonal
      .groupBy("g")
      .agg(sWide.head, sWide.tail: _*)
      .join(perG.select("g", "n_days", "sx"), "g")
      .join(rms, "g")
      .selectExpr(Seq("g", "n_days",
        "round(CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e2, 4)" +
          " + 0.0 AS level") ++
        (0 to 6).map(d => s"s$d") ++ Seq(
        "round(sqrt(CAST(qr AS DOUBLE) / CAST(n_days AS DOUBLE)) / 1e6, 4)" +
          " + 0.0 AS remainder_rms"): _*)
  }

  /** q239: daily order revenue decomposed per priority — is the
    * weekly cycle real once the level is removed, and how big is the
    * irregular term the q86/q105 monitors must tolerate?
    *
    * Spine contract: the MA runs over the 7 nearest OBSERVED days
    * (ROWS window on the observed spine) — on a dense daily series
    * this IS the calendar MA; at tiny SFs, where a priority can skip
    * a calendar day, both engines still compute the identical
    * well-defined statistic (the window semantics are shared text),
    * and at production scale the spine is dense by volume. */
  def dailyRevenueDecompose(spark: SparkSession, dir: String): DataFrame =
    weeklyDecompose(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT) AS t",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS c")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("x")))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical day cells, ±3 ROWS window, snap grids,
    * and final chains. */
  val dailyRevenueDecomposeSql: String = {
    val sCols = (0 to 6).map(d =>
      s"round(max(CASE WHEN dow = $d THEN s_cents END) / 1e2, 4) + 0.0 AS s$d")
      .mkString(",\n       |    ")
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
       |      AS BIGINT) AS t,
       |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |trended AS (
       |  SELECT g, t, x, (t + 4) % 7 AS dow, 7 * x - s7 AS det7
       |  FROM (
       |    SELECT g, t, x,
       |      count(*) OVER (PARTITION BY g ORDER BY t
       |        ROWS BETWEEN $Half PRECEDING AND $Half FOLLOWING) AS n7,
       |      sum(x) OVER (PARTITION BY g ORDER BY t
       |        ROWS BETWEEN $Half PRECEDING AND $Half FOLLOWING) AS s7
       |    FROM cells)
       |  WHERE n7 = ${2 * Half + 1}),
       |dowcells AS (
       |  SELECT g, dow, CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(det7) AS BIGINT) AS sd7,
       |    CAST(sum(x) AS BIGINT) AS sxd,
       |    CAST(floor(CAST(sum(det7) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      / 7.0 * 1e4 + 0.5) AS BIGINT) AS sr
       |  FROM trended GROUP BY 1, 2),
       |perg AS (
       |  SELECT g, CAST(sum(nd) AS BIGINT) AS n_days,
       |    CAST(sum(sxd) AS BIGINT) AS sx,
       |    CAST(sum(sr) AS BIGINT) AS tot_sr,
       |    CAST(count(*) AS BIGINT) AS n_dows
       |  FROM dowcells GROUP BY 1),
       |seasonal AS (
       |  SELECT d.g, d.dow,
       |    CAST(sr AS DOUBLE) / 1e4 - CAST(tot_sr AS DOUBLE)
       |      / (CAST(n_dows AS DOUBLE) * 1e4) AS s_cents
       |  FROM dowcells d JOIN perg USING (g)),
       |rms AS (
       |  SELECT t.g,
       |    CAST(sum(CAST(ri AS HUGEINT) * ri) AS HUGEINT) AS qr
       |  FROM (
       |    SELECT tr.g,
       |      CAST(floor((CAST(det7 AS DOUBLE) / 7.0 - s_cents) * 1e4 + 0.5)
       |        AS BIGINT) AS ri
       |    FROM trended tr JOIN seasonal s ON tr.g = s.g AND tr.dow = s.dow) t
       |  GROUP BY 1),
       |wide AS (
       |  SELECT g,
       |    $sCols
       |  FROM seasonal GROUP BY g)
       |SELECT w.g AS o_orderpriority, n_days,
       |  round(CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e2, 4)
       |    + 0.0 AS level,
       |  s0, s1, s2, s3, s4, s5, s6,
       |  round(sqrt(CAST(qr AS DOUBLE) / CAST(n_days AS DOUBLE)) / 1e6, 4)
       |    + 0.0 AS remainder_rms
       |FROM wide w JOIN perg USING (g) JOIN rms USING (g)""".stripMargin
  }
}
