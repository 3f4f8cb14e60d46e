package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** K-fold cross-validation of the linear fit — the model-VALIDATION
  * rung the regression deck stops short of: q32/q89 fit and report
  * in-sample coefficients, q156/q223 audit ONE fixed train/eval
  * split; k-fold answers "how well does this model family generalize"
  * with every row scored by a model that never saw it.
  *
  * The scale move (the q164 fusion lesson applied to CV): K folds do
  * NOT cost K training scans. Pass 1 computes per-fold sufficient
  * statistics (n, Σx, Σx², Σy, Σxy as exact fixed-point sum128
  * integers) in ONE scan; each fold's TRAINING stats are then
  * total − fold — pure arithmetic on the K-row frame — and the K
  * 2×2 Cramer solves happen at dimension grade. Pass 2 joins the
  * broadcast K-row coefficient frame back on the row's own fold (so
  * every row is scored by the model fitted WITHOUT it) and aggregates
  * holdout squared error per fold. Two scans total, any K.
  *
  * Exactness: fold assignment is the engine's deterministic
  * hash48 % K on the row key (the q156 split idiom); sufficient
  * statistics and SSE terms are micro-floored integers (order-free
  * sums); the Cramer solve and rmse are shared-text single
  * divisions/sqrt. Degenerate training sets (n < 2 or singular)
  * yield NULL coefficients and NULL rmse, never garbage. */
object CrossVal {

  /** Fold count (literal — shared with the oracle text). */
  val Folds = 5
  /** Fixed-point scale for sufficient statistics and SSE terms. */
  val FixedScale = 1000000.0

  private val Terms: Seq[(String, String)] = Seq(
    "sx" -> "x", "sxx" -> "x * x", "sy" -> "y", "sxy" -> "x * y")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  // 2×2 Cramer on (sw=n, sx, sxx; sy, sxy), shared text with q32's
  // normal-equation family
  private val DetSql = "(sw * sxx - sx * sx)"
  private val B0Sql = "(sxx * sy - sx * sxy)"
  private val B1Sql = "(sw * sxy - sx * sy)"
  private val GuardSql = s"n_train >= 2 AND abs($DetSql) > 1.0 / $FixedScale"

  /** K-fold CV over a frame with (key STRING, x, y): one row per
    * fold — (fold, n_train, n_test, b0, b1, rmse). */
  def kfold(rows: DataFrame): DataFrame = {
    val assigned = rows.selectExpr(
      // hash48 is an unsigned 48-bit value, so plain % is non-negative
      s"hash48(concat('cv:', key)) % $Folds AS fold",
      "CAST(x AS DOUBLE) AS x", "CAST(y AS DOUBLE) AS y")
      .localCheckpoint(true) // two passes: stats + holdout scoring
    val statCols = expr("CAST(count(1) AS BIGINT)").as("n") +:
      Terms.map { case (n, t) =>
        expr(s"sum128(CAST(floor(($t) * $FixedScale) AS BIGINT))").as(n)
      }
    val foldStats = assigned.groupBy("fold")
      .agg(statCols.head, statCols.tail: _*)
    // training stats = totals − this fold (K-row arithmetic)
    val totCols = expr("CAST(sum(n) AS BIGINT)").as("tn") +:
      Terms.map { case (n, _) =>
        expr(s"CAST(sum($n) AS DECIMAL(38,0))").as(s"t$n")
      }
    val totals = foldStats.agg(totCols.head, totCols.tail: _*)
    val solved = foldStats.crossJoin(broadcast(totals))
      .selectExpr(Seq("fold", "n AS n_test", "tn - n AS n_train") ++
        Terms.map { case (n, _) =>
          s"CAST(t$n - $n AS DECIMAL(38,0)) AS tr_$n"
        }: _*)
      .selectExpr(Seq("fold", "n_test", "n_train") ++
        Terms.map { case (n, _) =>
          s"CAST(tr_$n AS DOUBLE) / $FixedScale AS $n" }: _*)
    val coefs = solved
      .selectExpr("fold", "n_test", "n_train",
        "CAST(n_train AS DOUBLE) AS sw", "sx", "sxx", "sy", "sxy")
      .selectExpr("fold", "n_test", "n_train",
        s"CASE WHEN $GuardSql THEN $B0Sql / nullif($DetSql, 0.0) END AS b0",
        s"CASE WHEN $GuardSql THEN $B1Sql / nullif($DetSql, 0.0) END AS b1")
    assigned
      .join(broadcast(coefs), "fold")
      .selectExpr("fold",
        s"CAST(floor((y - b0 - b1 * x) * (y - b0 - b1 * x)" +
          s" * $FixedScale) AS BIGINT) AS se_i")
      .groupBy("fold")
      .agg(expr("sum128(se_i)").as("sse_i"))
      .join(broadcast(coefs), "fold")
      .selectExpr("fold", "n_train", "n_test",
        "round(b0, 6) + 0.0 AS b0",
        "round(b1, 6) + 0.0 AS b1",
        s"round(sqrt(CAST(sse_i AS DOUBLE) / $FixedScale" +
          " / CAST(n_test AS DOUBLE)), 6) + 0.0 AS rmse")
  }

  /** q242: does the q164 revenue-vs-quantity line generalize — 5-fold
    * CV on (x = l_quantity, y = l_extendedprice k$), fold-keyed by
    * (orderkey, linenumber). */
  def lineRevenueCv(spark: SparkSession, dir: String): DataFrame =
    kfold(Tables.lineitem(spark, dir)
      .selectExpr("concat(l_orderkey, ':', l_linenumber) AS key",
        "CAST(l_quantity AS DOUBLE) AS x",
        "CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y"))

  /** DuckDB twin: identical fold hash, one-pass fold stats, totals−fold
    * training arithmetic, shared Cramer text, holdout SSE. */
  val lineRevenueCvSql: String = {
    val sums = Terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0)) AS $n"
    }.mkString(", ")
    val tsums = Terms.map { case (n, _) =>
      s"CAST(sum($n) AS DECIMAL(38,0)) AS t$n" }.mkString(", ")
    val trCols = Terms.map { case (n, _) =>
      s"CAST(t$n - $n AS DECIMAL(38,0)) AS tr_$n" }.mkString(", ")
    val recCols = (Terms.map { case (n, _) =>
      s"CAST(tr_$n AS DOUBLE) / $FixedScale AS $n"
    } :+ "CAST(n_train AS DOUBLE) AS sw").mkString(", ")
    s"""WITH rows_ AS (
       |  SELECT ${Hashing.hash48Sql(
            s"concat('cv:', concat(l_orderkey, ':', l_linenumber))")} % $Folds
       |      AS fold,
       |    CAST(l_quantity AS DOUBLE) AS x,
       |    CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y
       |  FROM lineitem),
       |fs AS (
       |  SELECT fold, CAST(count(*) AS BIGINT) AS n, $sums
       |  FROM rows_ GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, $tsums FROM fs),
       |tr AS (
       |  SELECT fold, n AS n_test, tn - n AS n_train, $trCols
       |  FROM fs, tot),
       |rec AS (SELECT fold, n_test, n_train, $recCols FROM tr),
       |coefs AS (
       |  SELECT fold, n_test, n_train,
       |    CASE WHEN $GuardSql THEN $B0Sql / nullif($DetSql, 0.0) END AS b0,
       |    CASE WHEN $GuardSql THEN $B1Sql / nullif($DetSql, 0.0) END AS b1
       |  FROM rec),
       |sse AS (
       |  SELECT r.fold,
       |    CAST(sum(CAST(floor((y - b0 - b1 * x) * (y - b0 - b1 * x)
       |      * $FixedScale) AS BIGINT)) AS DECIMAL(38,0)) AS sse_i
       |  FROM rows_ r JOIN coefs c ON r.fold = c.fold
       |  GROUP BY 1)
       |SELECT c.fold, n_train, n_test,
       |  round(b0, 6) + 0.0 AS b0,
       |  round(b1, 6) + 0.0 AS b1,
       |  round(sqrt(CAST(sse_i AS DOUBLE) / $FixedScale
       |    / CAST(n_test AS DOUBLE)), 6) + 0.0 AS rmse
       |FROM coefs c JOIN sse s ON c.fold = s.fold""".stripMargin
  }
}
