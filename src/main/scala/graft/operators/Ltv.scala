package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cohort LTV curve — the REVENUE completion of q51. Retention (q51)
  * counts who comes back; the curve a pricing or acquisition decision
  * needs is cumulative revenue PER COHORT MEMBER by cohort age:
  * "a customer acquired in month m is worth $X by age a". Divergence
  * between cohort curves is the earliest product-health signal there
  * is (newer cohorts flattening = acquisition quality decay).
  *
  * Exactness: pure integers until display — cohort months are exact
  * integer month indexes (y·12 + m−1), revenue is exact summed cents,
  * the cumulative rides a window over exact BIGINTs, and LTV is ONE
  * shared-text division (cum cents / cohort size / 100) rounded at 4.
  *
  * Plan/scale: the q51 single-scan discipline — cohort month via a
  * per-customer window min (one shuffle; an aggregate+self-join form
  * would scan the fact twice), then one keyed aggregate to
  * (cohort, age) CELLS, a broadcast cohort-size join, and the
  * cumulative window over cells (~years² rows, value-level). */
object Ltv {

  /** Month index and display (shared between cells and sizes). */
  private val MonthIdx =
    "(year(od) * 12 + month(od) - 1)"

  /** LTV curve from orders: one row per (cohort_month, age_months):
    * (cohort_month, age_months, n_cohort, rev_cents, cum_ltv). */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val wCust = Window.partitionBy("o_custkey")
    val orders = Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_totalprice").isNotNull)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS od",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .withColumn("m", expr(MonthIdx))
      .withColumn("cm", min("m").over(wCust))
      .localCheckpoint(true) // cells + cohort sizes share one scan
    val sizes = orders
      .groupBy(col("cm"))
      .agg(countDistinct("o_custkey").as("n_cohort"))
    val cells = orders
      .groupBy(col("cm"), (col("m") - col("cm")).cast("long").as("age_months"))
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("rev_cents"))
    val wAge = Window.partitionBy("cm").orderBy("age_months")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .join(broadcast(sizes), "cm")
      .withColumn("cum_cents", sum("rev_cents").over(wAge))
      .selectExpr(
        "concat(CAST(cm div 12 AS STRING), '-'," +
          " lpad(CAST(cm % 12 + 1 AS STRING), 2, '0')) AS cohort_month",
        "age_months", "n_cohort", "rev_cents",
        "round(CAST(cum_cents AS DOUBLE) / CAST(n_cohort AS DOUBLE)" +
          " / 100.0, 4) + 0.0 AS cum_ltv")
  }

  /** DuckDB twin: identical month indexes, cells, cumulative, display. */
  val cohortLtvSql: String =
    s"""WITH o AS (
       |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
       |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents
       |  FROM orders
       |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
       |    AND o_totalprice IS NOT NULL),
       |m AS (SELECT o_custkey, $MonthIdx AS m, cents FROM o),
       |cm AS (
       |  SELECT o_custkey, m, cents,
       |    min(m) OVER (PARTITION BY o_custkey) AS cm
       |  FROM m),
       |sizes AS (
       |  SELECT cm, count(DISTINCT o_custkey) AS n_cohort FROM cm GROUP BY 1),
       |cells AS (
       |  SELECT cm, CAST(m - cm AS BIGINT) AS age_months,
       |    CAST(sum(cents) AS BIGINT) AS rev_cents
       |  FROM cm GROUP BY 1, 2),
       |cum AS (
       |  SELECT cells.cm, age_months, n_cohort, rev_cents,
       |    CAST(sum(rev_cents) OVER (PARTITION BY cells.cm ORDER BY age_months
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_cents
       |  FROM cells JOIN sizes ON cells.cm = sizes.cm)
       |SELECT concat(CAST(cm // 12 AS STRING), '-',
       |    lpad(CAST(cm % 12 + 1 AS STRING), 2, '0')) AS cohort_month,
       |  age_months, n_cohort, rev_cents,
       |  round(CAST(cum_cents AS DOUBLE) / CAST(n_cohort AS DOUBLE)
       |    / 100.0, 4) + 0.0 AS cum_ltv
       |FROM cum""".stripMargin
}
