package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Gini decision stump — the "is there a simple rule?" operator the
  * feature-evaluation deck was missing: q104's mutual information
  * scores an association, q83's AUC grades a ranking; the stump asks
  * the question a analyst actually starts with — WHICH single
  * threshold on this feature best separates the label, and how much
  * impurity does it remove (the root split of every tree model):
  *
  *   gain = gini(parent) − [n_L·gini(L) + n_R·gini(R)]/n
  *   gini(S) = 1 − p² − (1−p)²
  *
  * Exactness: candidate thresholds are VALUE-GRID cells (the
  * hundred-dollar grid here — the q186 spine, the documented
  * coarsening knob); (n_L, pos_L) come from exact cumulative counts,
  * the weighted impurity is ONE shared-text chain on exact integers,
  * and the ELECTION floors it to a 1e-12 grid and takes
  * min(struct(imp, v)) — deterministic, earliest threshold on ties;
  * the REPORTED impurities are recomputed from the elected cell's
  * exact integers (the floor only decides the argmin). The last cell
  * (empty right side) is excluded algebraically; a single-cell group
  * → NULL threshold.
  *
  * Plan/scale: one corpus-touch cell aggregate → a cumulative window
  * over the saturating value grid (q48/q141/q149 class) → one keyed
  * election aggregate → 1-row-per-group finish. */
object DecisionStump {

  // nullif denominators: ANSI codegen can evaluate a CASE branch's
  // subexpressions eagerly (the q225 lesson) — the empty-right-side
  // cell must yield a discarded NULL, not a DIVIDE_BY_ZERO throw
  private def gini(n: String, pos: String): String =
    s"(1.0 - (CAST($pos AS DOUBLE) / nullif(CAST($n AS DOUBLE), 0e0))" +
      s" * (CAST($pos AS DOUBLE) / nullif(CAST($n AS DOUBLE), 0e0))" +
      s" - (CAST($n - $pos AS DOUBLE) / nullif(CAST($n AS DOUBLE), 0e0))" +
      s" * (CAST($n - $pos AS DOUBLE) / nullif(CAST($n AS DOUBLE), 0e0)))"
  // weighted child impurity of the split at this cell (left = ≤ v),
  // parameterized on the total-count/total-positive column names so
  // the election pass and the final recompute share ONE text
  private def afterSql(nn: String, pos: String): String =
    s"((CAST(nl AS DOUBLE) * ${gini("nl", "posl")}" +
      s" + CAST($nn - nl AS DOUBLE) * ${gini(s"($nn - nl)", s"($pos - posl)")})" +
      s" / CAST($nn AS DOUBLE))"
  private val AfterSql = afterSql("nn", "pos")

  /** Best single split per group from (g, v, y): group, BIGINT grid
    * value, 0/1 label. One row per group: (g, n_rows, pos_rate,
    * threshold, gini_before, gini_after, gini_gain). */
  def stump(rows: DataFrame): DataFrame = {
    val cells = rows.select("g", "v", "y")
      .groupBy("g", "v")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("nc"),
        expr("CAST(sum(CAST(y AS BIGINT)) AS BIGINT)").as("posc"))
    val cum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy("g")
    cells
      .withColumn("nl", sum("nc").over(cum))
      .withColumn("posl", sum("posc").over(cum))
      .withColumn("nn", sum("nc").over(all))
      .withColumn("pos", sum("posc").over(all))
      .groupBy("g")
      .agg(
        expr("CAST(max(nn) AS BIGINT)").as("n_rows"),
        expr("CAST(max(pos) AS BIGINT)").as("n_pos"),
        expr("min(CASE WHEN nl < nn THEN named_struct(" +
          s"'imp', CAST(floor($AfterSql * 1e12) AS BIGINT)," +
          " 'v', v, 'nl', nl, 'posl', posl) END)").as("best"))
      .selectExpr("g", "n_rows", "n_pos",
        "best.v AS threshold", "best.nl AS nl", "best.posl AS posl")
      .selectExpr("g", "n_rows",
        "round(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) + 0.0" +
          " AS pos_rate",
        "threshold",
        s"round(${gini("n_rows", "n_pos")}, 6) + 0.0 AS gini_before",
        "CASE WHEN threshold IS NOT NULL THEN round(" +
          afterSql("n_rows", "n_pos") + ", 6) + 0.0 END AS gini_after")
      .selectExpr("g", "n_rows", "pos_rate", "threshold",
        "gini_before", "gini_after",
        "round(gini_before - gini_after, 6) + 0.0 AS gini_gain")
  }

  /** q232: the best single order-value threshold separating
    * fulfilled from open orders, per priority — on the hundred-dollar
    * grid (the q186 spine; threshold reported in those units). */
  def orderValueStump(spark: SparkSession, dir: String): DataFrame =
    stump(Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull &&
        col("o_orderstatus").isin("F", "O"))
      .selectExpr("o_orderpriority AS g",
        "CAST(floor(o_totalprice / 100) AS BIGINT) AS v",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y"))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cells, walk, election, and recompute. */
  val orderValueStumpSql: String = {
    val after = AfterSql
    val afterFinal = afterSql("n_rows", "n_pos")
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(floor(o_totalprice / 100) AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS nc,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS posc
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderstatus IN ('F', 'O')
       |  GROUP BY 1, 2),
       |walked AS (
       |  SELECT g, v,
       |    CAST(sum(nc) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS nl,
       |    CAST(sum(posc) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS posl,
       |    CAST(sum(nc) OVER (PARTITION BY g) AS BIGINT) AS nn,
       |    CAST(sum(posc) OVER (PARTITION BY g) AS BIGINT) AS pos
       |  FROM cells),
       |ranked AS (
       |  SELECT g, nn, pos, v, nl, posl,
       |    row_number() OVER (PARTITION BY g
       |      ORDER BY CAST(floor($after * 1e12) AS BIGINT) ASC, v ASC) AS rk
       |  FROM walked WHERE nl < nn),
       |elected AS (
       |  SELECT g, nn AS n_rows, pos AS n_pos, v AS threshold, nl, posl
       |  FROM ranked WHERE rk = 1),
       |tot AS (
       |  SELECT g, CAST(max(nn) AS BIGINT) AS n_rows,
       |    CAST(max(pos) AS BIGINT) AS n_pos
       |  FROM walked GROUP BY 1),
       |joined AS (
       |  SELECT t.g, t.n_rows, t.n_pos, e.threshold, e.nl, e.posl
       |  FROM tot t LEFT JOIN elected e ON t.g = e.g),
       |scored AS (
       |  SELECT g, n_rows,
       |    round(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) + 0.0
       |      AS pos_rate,
       |    threshold,
       |    round(${gini("n_rows", "n_pos")}, 6) + 0.0 AS gini_before,
       |    CASE WHEN threshold IS NOT NULL THEN
       |      round($afterFinal, 6) + 0.0 END AS gini_after
       |  FROM joined)
       |SELECT g AS o_orderpriority, n_rows, pos_rate, threshold,
       |  gini_before, gini_after,
       |  round(gini_before - gini_after, 6) + 0.0 AS gini_gain
       |FROM scored""".stripMargin
  }
}
