package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** New-vs-repeat revenue split — the REVENUE companion of q303's user
  * ledger: per calendar month, how many dollars came from customers
  * in their FIRST month vs customers who had bought before? The ratio
  * is the acquisition-dependence number — a business whose revenue is
  * mostly "new" stops growing the day acquisition does.
  *
  * Exactness: pure integers (cents, month indexes, counts); shares in
  * exact ppm by floor division (revenue is non-negative, so trunc ≡
  * floor in both engines).
  *
  * Plan/scale: the q51/q290 single-scan discipline — first month via
  * one per-customer window min, then ONE month rollup with
  * conditional sums. */
object NewRepeat {

  /** q309: per month — (month, rev_new_cents, rev_repeat_cents,
    * n_new_customers, n_repeat_customers, new_share_ppm). */
  def monthlyNewRepeat(spark: SparkSession, dir: String): DataFrame = {
    val wCust = Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_totalprice").isNotNull)
      .selectExpr("o_custkey",
        "CAST(year(CAST(o_orderdate AS DATE)) * 12" +
          " + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .withColumn("first_m", min("m").over(wCust))
      .withColumn("is_new", expr("CAST(m = first_m AS INT)"))
      .groupBy("m")
      .agg(
        expr("CAST(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END)" +
          " AS BIGINT)").as("rev_new_cents"),
        expr("CAST(sum(CASE WHEN is_new = 0 THEN cents ELSE 0 END)" +
          " AS BIGINT)").as("rev_repeat_cents"),
        expr("CAST(count(DISTINCT CASE WHEN is_new = 1 THEN o_custkey END)" +
          " AS BIGINT)").as("n_new_customers"),
        expr("CAST(count(DISTINCT CASE WHEN is_new = 0 THEN o_custkey END)" +
          " AS BIGINT)").as("n_repeat_customers"))
      .selectExpr(
        "concat(CAST(m div 12 AS STRING), '-'," +
          " lpad(CAST(m % 12 + 1 AS STRING), 2, '0')) AS month",
        "rev_new_cents", "rev_repeat_cents",
        "n_new_customers", "n_repeat_customers",
        "rev_new_cents * 1000000" +
          " div nullif(rev_new_cents + rev_repeat_cents, 0)" +
          " AS new_share_ppm")
  }

  val monthlyNewRepeatSql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(year(CAST(o_orderdate AS DATE)) * 12
      |      + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
      |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      |    AND o_totalprice IS NOT NULL),
      |w AS (
      |  SELECT *, CAST(m = min(m) OVER (PARTITION BY o_custkey) AS INT)
      |    AS is_new
      |  FROM o),
      |agg AS (
      |  SELECT m,
      |    CAST(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT)
      |      AS rev_new_cents,
      |    CAST(sum(CASE WHEN is_new = 0 THEN cents ELSE 0 END) AS BIGINT)
      |      AS rev_repeat_cents,
      |    CAST(count(DISTINCT CASE WHEN is_new = 1 THEN o_custkey END)
      |      AS BIGINT) AS n_new_customers,
      |    CAST(count(DISTINCT CASE WHEN is_new = 0 THEN o_custkey END)
      |      AS BIGINT) AS n_repeat_customers
      |  FROM w GROUP BY 1)
      |SELECT concat(CAST(m // 12 AS STRING), '-',
      |    lpad(CAST(m % 12 + 1 AS STRING), 2, '0')) AS month,
      |  rev_new_cents, rev_repeat_cents, n_new_customers,
      |  n_repeat_customers,
      |  rev_new_cents * 1000000
      |    // nullif(rev_new_cents + rev_repeat_cents, 0) AS new_share_ppm
      |FROM agg""".stripMargin
}
