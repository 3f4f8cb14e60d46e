package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Winsorized group means — the robust-location answer when q71's
  * MAD flags that outliers EXIST: clamp the tails at exact sample
  * percentiles and average what's left, so one fat-finger order stops
  * dragging the segment mean while (unlike trimming) the tail rows
  * still count at the boundary value. The de-facto standard
  * pre-aggregation for revenue-per-user style metrics.
  *
  * Semantics: per group, bounds are EXACT ORDER STATISTICS — lo is
  * the ⌈p·n⌉-th smallest value, hi the ⌈(1−p)·n⌉-th — not
  * interpolated quantiles: interpolation manufactures values the
  * sample never contained and its float arithmetic differs by ulps
  * across engines, while the k-th order statistic is data (the q118
  * lower-median philosophy). Index arithmetic is pure integer:
  * ⌈p·n⌉ = (pPct·n + 99) div 100.
  *
  * Exactness: values enter as integer cents; the winsorized sum is
  * Σ cnt·clamp(v, lo, hi) over value cells — all BIGINT; the single
  * final divide is shared text.
  *
  * Plan/scale: one map-side-combined aggregate to (group, value)
  * cells (checkpointed — totals, the banded running count, and the
  * clamp aggregate all read it), a BANDED cumulative over the cells
  * (BandedCumsum — per-task cap independent of how far the value
  * range saturates), dimension-grade totals/bound election broadcast
  * back, and one cell aggregate. The fact is scanned once; no
  * row-level window, no interpolation, no collect.
  */
object Winsorize {

  /** Per-group winsorized mean of `valueCol` (cents-exact) clamped at
    * the pPct / (100−pPct) exact order statistics. CellGuard-ed: a
    * continuous value column whose cells exceed `maxCells` per group
    * fails loudly instead of building a corpus-cardinality window. */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
                     pPct: Int = 5,
                     maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    require(pPct >= 1 && pPct < 50, s"pPct must be in [1,50), got $pPct")
    // r10: cell aggregate → ONE checkpoint shared by totals, the
    // BANDED running count, and the final clamp aggregate. The per-
    // group windows (running count + whole-partition totals + bound
    // election) put each group's ENTIRE cell frame in one task —
    // range-bounded (~10⁷ cents), but needlessly serial once the
    // range saturates; totals/bounds are now dimension-grade
    // aggregates broadcast back, and the running count a BandedCumsum
    // (absolute per-task cap), completing the family's 100× story
    // beyond the CellGuard backstop.
    val cells = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        expr(s"CAST(floor($valueCol * 100) AS BIGINT)").as("vi"))
      .groupBy("g", "vi")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true)
    val tot = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt) AS BIGINT)").as("n"),
        expr("CAST(sum(vi * cnt) AS BIGINT)").as("sv"),
        expr("CAST(count(1) AS BIGINT)").as("n_cells"))
      .filter(expr(CellGuard.sqlGuard("winsorizedMean", "n_cells", maxCells)))
    val bounds = BandedCumsum
      .cumsum(cells, Seq("g"), "vi", Seq("cnt"), inputCheckpointed = true)
      .join(broadcast(tot), "g")
      .groupBy("g")
      .agg(
        expr(s"CAST(min(CASE WHEN cum_cnt >= ($pPct * n + 99) div 100" +
          " THEN vi END) AS BIGINT)").as("lo"),
        expr(s"CAST(min(CASE WHEN cum_cnt >= ((100 - $pPct) * n + 99)" +
          " div 100 THEN vi END) AS BIGINT)").as("hi"))
    cells
      .join(broadcast(bounds), "g").join(broadcast(tot), "g")
      .groupBy("g")
      .agg(
        expr("CAST(max(n) AS BIGINT)").as("n_rows"),
        expr("CAST(max(lo) AS BIGINT)").as("loi"),
        expr("CAST(max(hi) AS BIGINT)").as("hii"),
        expr("CAST(max(sv) AS BIGINT)").as("svi"),
        expr("CAST(sum(cnt * least(greatest(vi, lo), hi)) AS BIGINT)").as("wsum"))
      .selectExpr("g", "n_rows",
        "round(CAST(loi AS DOUBLE) / 100, 4) + 0.0 AS lo_bound",
        "round(CAST(hii AS DOUBLE) / 100, 4) + 0.0 AS hi_bound",
        "round(CAST(svi AS DOUBLE) / CAST(n_rows AS DOUBLE) / 100, 4) + 0.0" +
          " AS raw_mean",
        "round(CAST(wsum AS DOUBLE) / CAST(n_rows AS DOUBLE) / 100, 4) + 0.0" +
          " AS winsorized_mean")
  }

  /** q126: winsorized mean line-item price per return flag — the
    * robust companion to q1's raw averages. */
  def lineitemWinsorized(spark: SparkSession, dir: String): DataFrame =
    winsorizedMean(Tables.lineitem(spark, dir), "l_returnflag",
      "l_extendedprice")
      .withColumnRenamed("g", "l_returnflag")

  val lineitemWinsorizedSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS g,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS vi,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, vi, cnt, sum(cnt) OVER (PARTITION BY g ORDER BY vi
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM cells),
      |tot AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(vi * cnt) AS BIGINT) AS sv
      |  FROM cells GROUP BY 1),
      |bounds AS (
      |  SELECT cum.g,
      |    min(CASE WHEN cum >= (5 * n + 99) // 100 THEN vi END) AS lo,
      |    min(CASE WHEN cum >= (95 * n + 99) // 100 THEN vi END) AS hi
      |  FROM cum JOIN tot ON cum.g = tot.g GROUP BY 1)
      |SELECT cells.g AS l_returnflag,
      |  CAST(max(n) AS BIGINT) AS n_rows,
      |  round(CAST(max(lo) AS DOUBLE) / 100, 4) + 0.0 AS lo_bound,
      |  round(CAST(max(hi) AS DOUBLE) / 100, 4) + 0.0 AS hi_bound,
      |  round(CAST(max(sv) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 100,
      |    4) + 0.0 AS raw_mean,
      |  round(CAST(sum(cnt * least(greatest(vi, lo), hi)) AS DOUBLE)
      |    / CAST(max(n) AS DOUBLE) / 100, 4) + 0.0 AS winsorized_mean
      |FROM cells
      |JOIN bounds ON cells.g = bounds.g
      |JOIN tot ON cells.g = tot.g
      |GROUP BY 1""".stripMargin
}
