package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Population Stability Index — THE industry drift number: how far a
  * value distribution moved between a baseline period and a current
  * one, binned by the BASELINE's own deciles (PSI < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 population change). Completes the
  * monitoring bench: q86 compares marginal moments, q99 tests the
  * hypothesis "same distribution?", PSI is the standardized effect
  * SIZE every model-risk team thresholds on.
  *
  * Semantics: per segment, bin edges are the baseline period's EXACT
  * decile order statistics (⌈k·n_A/10⌉-th smallest, the q126
  * no-interpolation rule; tied cents can merge bins — they then hold
  * 0 rows and both shares floor); both periods' rows land in bins by
  * edge comparison; PSI = Σ_bins (p − q)·ln(p/q) with an all-zero
  * share replaced by 1e-4 (the textbook zero-replacement, applied to
  * BOTH sides' empty bins symmetrically).
  *
  * Exactness: integer value cells (floor(value·scale)), integer edge
  * election, integer bin counts; each bin's PSI term is the identical shared-text double
  * (snapped ln, q103 grid) FLOORED to integer nano-nats before the
  * ≤ 10-term sum (a double sum is order-sensitive — the q139 rule);
  * one shared final de-scale.
  *
  * Plan/scale: one (segment, value-cell, period) cell aggregate
  * (checkpointed) → BANDED baseline cumulative (BandedCumsum —
  * per-task cap even at range saturation) + broadcast totals →
  * dimension-grade edge election → broadcast edge join back onto the
  * CELLS (not the fact) → 10-bin spine aggregate. The fact is
  * scanned once. Cells
  * key on `floor(value · scale)` — `scaleSql` is the quantize-first
  * knob (r9 verdict: cent cells of a near-unique fact column are
  * order-cardinality; q141 now bins WHOLE DOLLARS, whose cell count
  * is bounded by the price RANGE ~10⁵ at any SF — decile edges move
  * by under the quantum, which PSI's 0.1/0.25 thresholds don't feel)
  * — and a CellGuard raise_error makes a continuous value column fail
  * loudly instead of rebuilding the single-task window.
  */
object Psi {

  /** Per-segment PSI of `valueCol` between `periodExpr` = false
    * (baseline A) and true (current B). Cells are
    * floor(value · scaleSql); pick the scale so value-range × scale
    * stays dimension-grade (maxCells-guarded). A segment with an
    * EMPTY baseline has no edges to bin by — it reports NULL psi with
    * drift_level 'no_baseline' (the mirror of the empty-current case,
    * whose PSI is well-defined: every current share zero-floors). */
  def psi(df: DataFrame, segCol: String, valueCol: String,
          periodExpr: String, scaleSql: String = "1e2",
          maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    val cells = df
      .filter(col(segCol).isNotNull && col(valueCol).isNotNull)
      .select(col(segCol).as("g"),
        expr(s"CAST(floor($valueCol * $scaleSql) AS BIGINT)").as("v"),
        expr(s"CASE WHEN $periodExpr THEN 1 ELSE 0 END").as("pb"))
      .groupBy("g", "v")
      .agg(expr("CAST(sum(1 - pb) AS BIGINT)").as("ca"),
        expr("CAST(sum(pb) AS BIGINT)").as("cb"))
      .localCheckpoint(true) // edges + totals + bin counts all read it
    // r10: baseline totals + the CellGuard ride one dimension-grade
    // aggregate broadcast back; the baseline cumulative is a
    // BandedCumsum — per-task cap even at value-range saturation
    val tot = cells.groupBy("g")
      .agg(expr("CAST(sum(ca) AS BIGINT)").as("na"),
        expr("CAST(sum(cb) AS BIGINT)").as("nb"),
        expr("CAST(count(1) AS BIGINT)").as("n_cells"))
      .filter(expr(CellGuard.sqlGuard("psi", "n_cells", maxCells)))
    val withCum = BandedCumsum
      // 4096-wide bands: matched to dollar-scale cells (~10⁵ range),
      // where the cent-scale default would leave ~2 bands
      .cumsum(cells, Seq("g"), "v", Seq("ca"), bandWidth = 4096L,
        inputCheckpointed = true)
      .join(broadcast(tot), "g")
    val edgeAggs = (1 to 9).map(k =>
      expr(s"CAST(min(CASE WHEN cum_ca >= ($k * na + 9) div 10 THEN v END)" +
        s" AS BIGINT)").as(s"e$k")) ++
      Seq(expr("CAST(max(na) AS BIGINT)").as("na"),
        expr("CAST(max(nb) AS BIGINT)").as("nb"))
    val edges = withCum.groupBy("g")
      .agg(edgeAggs.head, edgeAggs.tail.toIndexedSeq: _*)
    val binExpr = "CAST(1 " +
      (1 to 9).map(k => s"+ (CASE WHEN v > e$k THEN 1 ELSE 0 END)").mkString(" ") +
      " AS INT)"
    val binned = cells.join(broadcast(edges), "g")
      .selectExpr("g", s"$binExpr AS bin", "ca", "cb", "na", "nb")
      .groupBy("g", "bin")
      .agg(expr("CAST(sum(ca) AS BIGINT)").as("ba"),
        expr("CAST(sum(cb) AS BIGINT)").as("bb"),
        expr("CAST(max(na) AS BIGINT)").as("na"),
        expr("CAST(max(nb) AS BIGINT)").as("nb"))
    // 10-bin spine so empty bins contribute their zero-replaced term
    val spine = edges.selectExpr("g", "na", "nb")
      .crossJoin(broadcast(
        df.sparkSession.range(1, 11).selectExpr("CAST(id AS INT) AS bin")))
    val termSql = {
      val pa = "CASE WHEN ba0 = 0 THEN 1e-4" +
        " ELSE CAST(ba0 AS DOUBLE) / CAST(na AS DOUBLE) END"
      val pb = "CASE WHEN bb0 = 0 THEN 1e-4" +
        " ELSE CAST(bb0 AS DOUBLE) / CAST(nb AS DOUBLE) END"
      val lnS = s"CAST(floor(ln(($pa) / ($pb)) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
      s"CAST(floor((($pa) - ($pb)) * ($lnS) * 1e9) AS DECIMAL(38,0))"
    }
    spine.join(binned.select("g", "bin", "ba", "bb"), Seq("g", "bin"), "left")
      .selectExpr("g", "na", "nb",
        "coalesce(ba, CAST(0 AS BIGINT)) AS ba0",
        "coalesce(bb, CAST(0 AS BIGINT)) AS bb0")
      .groupBy("g")
      .agg(expr("CAST(max(na) AS BIGINT)").as("n_base"),
        expr("CAST(max(nb) AS BIGINT)").as("n_current"),
        expr(s"CAST(sum($termSql) AS DECIMAL(38,0))").as("s_psi"))
      .selectExpr("g", "n_base", "n_current",
        "CASE WHEN n_base = 0 THEN CAST(NULL AS DOUBLE)" +
          " ELSE round(CAST(s_psi AS DOUBLE) / 1e9, 6) + 0.0 END AS psi")
      .selectExpr("g", "n_base", "n_current", "psi",
        "CASE WHEN n_base = 0 THEN 'no_baseline'" +
          " WHEN psi < 0.1 THEN 'stable'" +
          " WHEN psi < 0.25 THEN 'moderate' ELSE 'major' END AS drift_level")
  }

  /** q141: price-distribution stability per order priority, 1995–97
    * baseline vs 1998+ current. WHOLE-DOLLAR cells (scale 1e0): cell
    * count is bounded by the o_totalprice range (~10⁵) at any SF,
    * where cent cells of this near-unique column were
    * order-cardinality (r9 verdict fix). */
  def orderPricePsi(spark: SparkSession, dir: String): DataFrame =
    psi(Tables.orders(spark, dir), "o_orderpriority", "o_totalprice",
      "o_orderdate >= timestamp'1998-01-01 00:00:00'", scaleSql = "1e0")
      .withColumnRenamed("g", "o_orderpriority")

  val orderPricePsiSql: String = {
    val termSql = {
      val pa = "CASE WHEN ba0 = 0 THEN 1e-4" +
        " ELSE CAST(ba0 AS DOUBLE) / CAST(na AS DOUBLE) END"
      val pb = "CASE WHEN bb0 = 0 THEN 1e-4" +
        " ELSE CAST(bb0 AS DOUBLE) / CAST(nb AS DOUBLE) END"
      val lnS = s"CAST(floor(ln(($pa) / ($pb)) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
      s"CAST(floor((($pa) - ($pb)) * ($lnS) * 1e9) AS HUGEINT)"
    }
    val binExpr = "CAST(1 " +
      (1 to 9).map(k => s"+ (CASE WHEN v > e$k THEN 1 ELSE 0 END)").mkString(" ") +
      " AS INT)"
    val edgeCols = (1 to 9).map(k =>
      s"CAST(min(CASE WHEN cum_a >= ($k * na + 9) // 10 THEN v END)" +
        s" AS BIGINT) AS e$k").mkString(",\n       |    ")
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(floor(o_totalprice * 1e0) AS BIGINT) AS v,
       |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
       |      THEN 0 ELSE 1 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, v, ca, cb,
       |    CAST(sum(ca) OVER (PARTITION BY g) AS BIGINT) AS na,
       |    CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS nb,
       |    sum(ca) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a
       |  FROM cells),
       |edges AS (
       |  SELECT g,
       |    $edgeCols,
       |    CAST(max(na) AS BIGINT) AS na, CAST(max(nb) AS BIGINT) AS nb
       |  FROM cum GROUP BY 1),
       |binned AS (
       |  SELECT cells.g, $binExpr AS bin,
       |    CAST(sum(ca) AS BIGINT) AS ba, CAST(sum(cb) AS BIGINT) AS bb
       |  FROM cells JOIN edges ON cells.g = edges.g
       |  GROUP BY 1, 2),
       |spine AS (
       |  SELECT edges.g, na, nb, b.bin
       |  FROM edges CROSS JOIN (SELECT unnest(range(1, 11)) AS bin) b),
       |joined AS (
       |  SELECT spine.g, na, nb,
       |    coalesce(ba, 0) AS ba0, coalesce(bb, 0) AS bb0
       |  FROM spine LEFT JOIN binned
       |    ON spine.g = binned.g AND spine.bin = binned.bin),
       |agg AS (
       |  SELECT g, CAST(max(na) AS BIGINT) AS n_base,
       |    CAST(max(nb) AS BIGINT) AS n_current,
       |    CAST(sum($termSql) AS HUGEINT) AS s_psi
       |  FROM joined GROUP BY 1)
       |SELECT g AS o_orderpriority, n_base, n_current,
       |  CASE WHEN n_base = 0 THEN CAST(NULL AS DOUBLE)
       |    ELSE round(CAST(s_psi AS DOUBLE) / 1e9, 6) + 0.0 END AS psi,
       |  CASE WHEN n_base = 0 THEN 'no_baseline'
       |    WHEN round(CAST(s_psi AS DOUBLE) / 1e9, 6) + 0.0 < 0.1
       |      THEN 'stable'
       |    WHEN round(CAST(s_psi AS DOUBLE) / 1e9, 6) + 0.0 < 0.25
       |      THEN 'moderate'
       |    ELSE 'major' END AS drift_level
       |FROM agg""".stripMargin
  }
}
