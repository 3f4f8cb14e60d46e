package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Growth accounting — the MAU ledger (new / retained / resurrected /
  * churned). q51's cohort grid shows each acquisition vintage decay;
  * the growth ledger answers the operating question per CALENDAR
  * month: of this month's actives, who is brand new, who carried over
  * from last month, who came back from dormancy — and how many of
  * last month's actives vanished. MAU_m = new + retained +
  * resurrected, and the ledger identity
  * MAU_m = MAU_{m−1} + new + resurrected − churned is the
  * growth-is-inputs-minus-outputs statement every activity report
  * builds on (spec-asserted).
  *
  * Exactness: pure integers — month indexes (y·12+m−1), per-user lag
  * comparisons, and counts. Nothing rounds.
  *
  * Plan/scale: one scan → distinct (user, month) cells → ONE per-user
  * window (min + lag over the user's own months — cells, not events)
  * → one month rollup; churn events are a projection of the same
  * walked frame (a user active in m churns at m+1 unless active
  * there), capped at the corpus's last month. */
object GrowthAccounting {

  /** Ledger from activity cells (u, m BIGINT month index): one row
    * per month — (m, mau, n_new, n_retained, n_resurrected,
    * n_churned). */
  def ledger(cells: DataFrame): DataFrame = {
    val w = Window.partitionBy("u").orderBy("m")
    val walked = cells
      .select("u", "m").distinct()
      .withColumn("first_m", min("m").over(Window.partitionBy("u")))
      .withColumn("prev_m", lag("m", 1).over(w))
      .withColumn("next_m", lead("m", 1).over(w))
      .localCheckpoint(true) // class rollup + churn projection
    val classes = walked
      .selectExpr("m",
        "CAST(m = first_m AS BIGINT) AS is_new",
        "CAST(prev_m = m - 1 AS BIGINT) AS is_retained")
      .selectExpr("m", "is_new",
        "coalesce(is_retained, CAST(0 AS BIGINT)) AS is_retained")
      .withColumn("is_resurrected", expr(
        "CAST(is_new = 0 AND is_retained = 0 AS BIGINT)"))
      .groupBy("m")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("mau"),
        expr("CAST(sum(is_new) AS BIGINT)").as("n_new"),
        expr("CAST(sum(is_retained) AS BIGINT)").as("n_retained"),
        expr("CAST(sum(is_resurrected) AS BIGINT)").as("n_resurrected"))
    val lastM = walked.agg(max("m").as("last_m"))
    val churn = walked
      .crossJoin(broadcast(lastM))
      // active in m, not active in m+1, and m+1 is still observable
      .filter(expr("(next_m IS NULL OR next_m > m + 1) AND m < last_m"))
      .selectExpr("m + 1 AS m")
      .groupBy("m")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_churned"))
    classes.join(churn, Seq("m"), "left")
      .selectExpr("m", "mau", "n_new", "n_retained", "n_resurrected",
        "coalesce(n_churned, CAST(0 AS BIGINT)) AS n_churned")
  }

  /** q303: the customer order-activity growth ledger by calendar
    * month (month display = yyyy-MM, the q290 convention). */
  def orderGrowthLedger(spark: SparkSession, dir: String): DataFrame =
    ledger(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .selectExpr("o_custkey AS u",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12" +
          " + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m"))
      .selectExpr(
        "concat(CAST(m div 12 AS STRING), '-'," +
          " lpad(CAST(m % 12 + 1 AS STRING), 2, '0')) AS month",
        "mau", "n_new", "n_retained", "n_resurrected", "n_churned")

  /** DuckDB twin: identical cells, per-user walk, churn projection. */
  val orderGrowthLedgerSql: String =
    """WITH cells AS (
      |  SELECT DISTINCT o_custkey AS u,
      |    CAST(year(CAST(o_orderdate AS DATE)) * 12
      |      + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
      |walked AS (
      |  SELECT u, m,
      |    min(m) OVER (PARTITION BY u) AS first_m,
      |    lag(m, 1) OVER (PARTITION BY u ORDER BY m) AS prev_m,
      |    lead(m, 1) OVER (PARTITION BY u ORDER BY m) AS next_m
      |  FROM cells),
      |classes AS (
      |  SELECT m, CAST(count(*) AS BIGINT) AS mau,
      |    CAST(sum(CAST(m = first_m AS BIGINT)) AS BIGINT) AS n_new,
      |    CAST(sum(coalesce(CAST(prev_m = m - 1 AS BIGINT), 0)) AS BIGINT)
      |      AS n_retained,
      |    CAST(sum(CAST(m <> first_m
      |      AND coalesce(CAST(prev_m = m - 1 AS BIGINT), 0) = 0 AS BIGINT))
      |      AS BIGINT) AS n_resurrected
      |  FROM walked GROUP BY 1),
      |last_m AS (SELECT max(m) AS lm FROM walked),
      |churn AS (
      |  SELECT m + 1 AS m, CAST(count(*) AS BIGINT) AS n_churned
      |  FROM walked CROSS JOIN last_m
      |  WHERE (next_m IS NULL OR next_m > m + 1) AND m < lm
      |  GROUP BY 1)
      |SELECT concat(CAST(m // 12 AS STRING), '-',
      |    lpad(CAST(m % 12 + 1 AS STRING), 2, '0')) AS month,
      |  mau, n_new, n_retained, n_resurrected,
      |  coalesce(n_churned, CAST(0 AS BIGINT)) AS n_churned
      |FROM classes LEFT JOIN churn USING (m)""".stripMargin
}
