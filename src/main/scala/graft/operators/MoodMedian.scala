package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mood's median test — the k-sample LOCATION test with the weakest
  * assumptions on the deck: q98's ANOVA needs variance homogeneity,
  * q176's Kruskal–Wallis reads the whole rank distribution; Mood asks
  * only "do the k classes straddle the COMMON median equally?" — a
  * 2×k chi-square of (above / at-or-below the pooled median) counts,
  * the robust first screen when distributions are wild enough that
  * even ranks feel strong.
  *
  * Exactness: the pooled LOWER median (position (N+1) div 2 —
  * documented tie convention) is an exact cell lookup on the banded
  * walk; the 2×k table is pure integers; each class's chi-square term
  * is a shared-text double snapped to MICRO and integer-summed (the
  * q187 move — classes are dimension-grade but the discipline holds
  * everywhere).
  *
  * Plan/scale: one corpus-touch aggregate to (class, value) cells →
  * pooled cells (a cell-frame re-aggregate) → a [[BandedCumsum]]
  * median walk (absolute per-task cap) → broadcast median → one
  * conditional class aggregate → 1-row finish. */
object MoodMedian {

  /** Per-class chi-square term (shared text): a/b observed above /
    * at-or-below, e from the class total and the pooled split. */
  private val TermSql =
    "((CAST(a AS DOUBLE) - CAST(nc AS DOUBLE) * CAST(ta AS DOUBLE)" +
      " / CAST(n AS DOUBLE)) * (CAST(a AS DOUBLE) - CAST(nc AS DOUBLE)" +
      " * CAST(ta AS DOUBLE) / CAST(n AS DOUBLE))" +
      " / nullif(CAST(nc AS DOUBLE) * CAST(ta AS DOUBLE)" +
      " / CAST(n AS DOUBLE), 0.0)" +
      " + (CAST(b AS DOUBLE) - CAST(nc AS DOUBLE) * CAST(tb AS DOUBLE)" +
      " / CAST(n AS DOUBLE)) * (CAST(b AS DOUBLE) - CAST(nc AS DOUBLE)" +
      " * CAST(tb AS DOUBLE) / CAST(n AS DOUBLE))" +
      " / nullif(CAST(nc AS DOUBLE) * CAST(tb AS DOUBLE)" +
      " / CAST(n AS DOUBLE), 0.0))"

  /** Mood's median test over a frame with (cls, v): class label and
    * integer value. ONE output row: (n_rows, k_classes, median_v,
    * chi2, dof) — NULL chi2 when the pooled split is degenerate
    * (every value on one side of the median). */
  def moodTest(values: DataFrame): DataFrame = {
    val catCells = values.groupBy("cls", "v")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // pooled walk + class counts read it
    val pooled = catCells.groupBy("v")
      .agg(expr("CAST(sum(cnt) AS BIGINT)").as("cnt"))
      .withColumn("g", lit(0))
    val totals = pooled.groupBy("g")
      .agg(expr("CAST(sum(cnt) AS BIGINT)").as("n"))
    // lower median: the cell covering position (n+1) div 2
    val med = BandedCumsum.cumsum(pooled, Seq("g"), "v", Seq("cnt"))
      .join(broadcast(totals), "g")
      .withColumn("cb", col("cum_cnt") - col("cnt"))
      .groupBy("g")
      .agg(expr("CAST(min(CASE WHEN cb < (n + 1) div 2" +
        " AND cb + cnt >= (n + 1) div 2 THEN v END) AS BIGINT)")
        .as("median_v"))
    val classes = catCells
      .crossJoin(broadcast(med.drop("g")))
      .groupBy("cls")
      .agg(
        first("median_v").as("median_v"),
        expr("CAST(sum(CASE WHEN v > median_v THEN cnt ELSE 0 END)" +
          " AS BIGINT)").as("a"),
        expr("CAST(sum(CASE WHEN v <= median_v THEN cnt ELSE 0 END)" +
          " AS BIGINT)").as("b"))
    val marked = classes.withColumn("nc", expr("a + b"))
      .localCheckpoint(true) // global totals + terms both read it
    val gt = marked.groupBy()
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("k_classes"),
        expr("CAST(sum(a) AS BIGINT)").as("ta"),
        expr("CAST(sum(b) AS BIGINT)").as("tb"),
        expr("CAST(sum(a) + sum(b) AS BIGINT)").as("n"))
    marked
      .crossJoin(broadcast(gt))
      .selectExpr("median_v", "k_classes", "n", "ta", "tb",
        s"CAST(floor($TermSql * 1e6 + 5e-1) AS BIGINT) AS t_micro")
      .groupBy("median_v", "k_classes", "n")
      .agg(expr("CAST(sum(t_micro) AS BIGINT)").as("chi2_micro"))
      .selectExpr("n AS n_rows", "k_classes", "median_v",
        "round(CAST(chi2_micro AS DOUBLE) / 1e6, 6) + 0.0 AS chi2",
        "k_classes - 1 AS dof")
  }

  /** q204: do the event types share a common median event value —
    * the robust location screen on the cent grid, one test row. */
  def eventValueMood(spark: SparkSession, dir: String): DataFrame =
    moodTest(Tables.events(spark, dir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .selectExpr("event_type AS cls",
        "CAST(floor(value * 1e2) AS BIGINT) AS v"))

  /** DuckDB twin: identical median lookup, table, snapped terms. */
  val eventValueMoodSql: String =
    s"""WITH base AS (
       |  SELECT event_type AS cls, CAST(floor(value * 1e2) AS BIGINT) AS v
       |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |cat_cells AS (
       |  SELECT cls, v, CAST(count(*) AS BIGINT) AS cnt
       |  FROM base GROUP BY 1, 2),
       |pooled AS (
       |  SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM cat_cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM pooled),
       |walked AS (
       |  SELECT v, cnt, n,
       |    coalesce(CAST(sum(cnt) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cb
       |  FROM pooled CROSS JOIN tot),
       |med AS (
       |  SELECT CAST(min(CASE WHEN cb < (n + 1) // 2
       |    AND cb + cnt >= (n + 1) // 2 THEN v END) AS BIGINT) AS median_v
       |  FROM walked),
       |classes AS (
       |  SELECT cls, first(median_v) AS median_v,
       |    CAST(sum(CASE WHEN v > median_v THEN cnt ELSE 0 END) AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN v <= median_v THEN cnt ELSE 0 END) AS BIGINT) AS b
       |  FROM cat_cells CROSS JOIN med GROUP BY 1),
       |marked AS (SELECT *, a + b AS nc FROM classes),
       |totals AS (
       |  SELECT first(median_v) AS median_v,
       |    CAST(count(*) AS BIGINT) AS k_classes,
       |    CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
       |    CAST(sum(a) + sum(b) AS BIGINT) AS n
       |  FROM marked),
       |terms AS (
       |  SELECT median_v, k_classes, n,
       |    CAST(floor($TermSql * 1e6 + 5e-1) AS BIGINT) AS t_micro
       |  FROM marked CROSS JOIN (SELECT k_classes, ta, tb, n,
       |    median_v AS mv FROM totals)
       |  ),
       |agg AS (
       |  SELECT median_v, k_classes, n,
       |    CAST(sum(t_micro) AS BIGINT) AS chi2_micro
       |  FROM terms GROUP BY 1, 2, 3)
       |SELECT n AS n_rows, k_classes, median_v,
       |  round(CAST(chi2_micro AS DOUBLE) / 1e6, 6) + 0.0 AS chi2,
       |  k_classes - 1 AS dof
       |FROM agg""".stripMargin
}
