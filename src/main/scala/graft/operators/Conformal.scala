package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Split-conformal prediction intervals — the distribution-free
  * uncertainty wrapper modern ML serving puts around ANY point model
  * (Vovk et al.; Lei et al. 2018): fit on a TRAIN split, take the
  * ⌈(n+1)(1−α)⌉-th smallest absolute residual on a CALIBRATION split
  * as the interval half-width q̂, and the interval ŷ ± q̂ covers a
  * fresh point with probability ≥ 1−α — no distributional assumption,
  * exactly finite-sample, which is why it composes with the q144
  * bootstrap and the q96-q100 test stack as the prediction-side
  * uncertainty layer.
  *
  * Determinism/exactness: the three-way split is the q38
  * hash-threshold discipline (seeded hash48 of the row key mod 10 —
  * both engines reproduce the exact membership: train 0-3, cal 4-6,
  * eval 7-9); the per-group model is the train-split floor-mean in
  * exact cents (one BIGINT div); conformity scores are
  * dollar-quantized integer residuals (the q47 quantize-first
  * discipline — scores form range-bounded value CELLS, CellGuard-
  * enforced); q̂ is an exact lower order statistic over the cells
  * (rank ⌈(n_cal+1)·(1−α)⌉ in pure integer arithmetic, the q126
  * no-interpolation rule — when the rank exceeds n_cal the interval
  * is infinite and q̂/coverage report NULL); coverage on the held-out
  * EVAL split is one exact ratio.
  *
  * Plan/scale: one scan → checkpoint → split tags as a projection →
  * per-(group, split) aggregates (map-side combined) → score cells
  * per group (range-bounded, guarded) → one cells-window per group →
  * broadcast q̂ join back to the eval aggregate. No corpus-sized
  * window, no corpus collect.
  */
object Conformal {

  /** Split seed (hash48 family member). */
  val Seed = 149

  /** ⌈(n+1)·9/10⌉ as pure integer arithmetic (α = 1/10). */
  private def rankSqlOf(n: String): String = s"(9 * (($n) + 1) + 9) div 10"

  /** q149: per-priority 90% conformal interval for order totalprice
    * under the train-mean model, with eval-split coverage. */
  def orderPriceConformal(spark: SparkSession, dir: String,
      maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull && col("o_orderpriority").isNotNull)
      .select(col("o_orderpriority").as("g"),
        expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("yc"),
        (Hashing.hash48(Seed, col("o_orderkey").cast("string")) % 10).as("b"))
      .localCheckpoint(true) // three splits + cells all read it
    val model = rows.filter(col("b") < 4)
      .groupBy("g")
      .agg(count(lit(1)).as("n_train"), sum("yc").as("syc"))
      .selectExpr("g", "n_train", "syc div n_train AS yhat_c")
    val cal = rows.filter(col("b") >= 4 && col("b") <= 6)
      .join(broadcast(model), "g")
      .selectExpr("g", "abs(yc - yhat_c) div 100 AS score_d")
    val calN = cal.groupBy("g").agg(count(lit(1)).as("n_cal"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("score_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCells = Window.partitionBy(col("g"))
    val qhat = cal.groupBy("g", "score_d")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_cells", count(lit(1)).over(wCells))
      .filter(expr(CellGuard.sqlGuard("orderPriceConformal", "n_cells", maxCells)))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .join(broadcast(calN), "g")
      .filter(expr(s"cum >= ${rankSqlOf("n_cal")}"))
      .groupBy("g")
      .agg(min(col("score_d")).as("qhat_d"))
    val eval_ = rows.filter(col("b") >= 7)
      .join(broadcast(model), "g")
      .join(broadcast(qhat), Seq("g"), "left")
      .groupBy("g")
      .agg(count(lit(1)).as("n_eval"),
        first(col("n_train")).as("n_train"),
        first(col("qhat_d")).as("qhat_d"),
        sum(expr("CASE WHEN qhat_d IS NOT NULL AND" +
          " abs(yc - yhat_c) div 100 <= qhat_d THEN 1 ELSE 0 END")).as("n_cov"))
    eval_.join(broadcast(calN), "g")
      .selectExpr("g AS o_orderpriority", "n_train", "n_cal", "n_eval",
        "qhat_d",
        "CASE WHEN qhat_d IS NULL THEN NULL" +
          " ELSE round(CAST(n_cov AS DOUBLE) / n_eval, 4) + 0.0 END AS coverage")
  }

  /** DuckDB twin: identical splits, floor-mean, dollar cells, exact
    * rank, coverage text. */
  val orderPriceConformalSql: String = {
    s"""WITH rows_ AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS yc,
       |    ${Hashing.hash48Sql(Seed, "(o_orderkey)::VARCHAR")} % 10 AS b
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
       |model AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_train,
       |    CAST(sum(yc) AS BIGINT) // count(*) AS yhat_c
       |  FROM rows_ WHERE b < 4 GROUP BY 1),
       |cal AS (
       |  SELECT r.g, abs(r.yc - m.yhat_c) // 100 AS score_d
       |  FROM rows_ r JOIN model m ON m.g = r.g
       |  WHERE r.b >= 4 AND r.b <= 6),
       |caln AS (SELECT g, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY 1),
       |cells AS (
       |  SELECT g, score_d, CAST(count(*) AS BIGINT) AS cnt FROM cal
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, score_d,
       |    sum(cnt) OVER (PARTITION BY g ORDER BY score_d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM cells),
       |qhat AS (
       |  SELECT c.g, min(c.score_d) AS qhat_d
       |  FROM cum c JOIN caln n ON n.g = c.g
       |  WHERE c.cum >= (9 * (n.n_cal + 1) + 9) // 10
       |  GROUP BY 1),
       |ev AS (
       |  SELECT r.g, CAST(count(*) AS BIGINT) AS n_eval,
       |    any_value(m.n_train) AS n_train,
       |    any_value(q.qhat_d) AS qhat_d,
       |    CAST(sum(CASE WHEN q.qhat_d IS NOT NULL AND
       |      abs(r.yc - m.yhat_c) // 100 <= q.qhat_d THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_cov
       |  FROM rows_ r JOIN model m ON m.g = r.g
       |  LEFT JOIN qhat q ON q.g = r.g
       |  WHERE r.b >= 7 GROUP BY 1)
       |SELECT ev.g AS o_orderpriority, n_train, n.n_cal, n_eval, qhat_d,
       |  CASE WHEN qhat_d IS NULL THEN NULL
       |    ELSE round(CAST(n_cov AS DOUBLE) / n_eval, 4) + 0.0 END AS coverage
       |FROM ev JOIN caln n ON n.g = ev.g""".stripMargin
  }
}
