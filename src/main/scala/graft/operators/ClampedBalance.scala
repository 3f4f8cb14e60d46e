package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Clamped running balance — the "stateful" recurrence that ISN'T.
  * Inventory on hand, prepaid credit, queue backlog all follow
  * b_t = max(0, b_{t−1} + d_t): the balance absorbs net flow but can
  * never go negative (unmet demand is dropped, not borrowed). That
  * recurrence looks like a sequential scan — the op engines reach for
  * UDAF loops for — but it has the classic reflection closed form
  * (Lindley's recursion / the M/G/1 workload identity):
  *
  *   b_t = S_t − min(0, min_{j≤t} S_j),   S = prefix sum of d
  *
  * so TWO stock windows (cumsum + running min) compute it exactly,
  * keeping the whole operator declarative, codegen'd, and one
  * partition-local pass per key.
  *
  * Exactness: flows are exact integer units; both windows and the
  * clamp identity are integer arithmetic. The zero-day count and the
  * argmax-free final/max reads are integer comparisons.
  *
  * Plan/scale: one scan → (key, day) flow cells → one per-key window
  * pass (cell-level, partitioned by key — no global sort) → one keyed
  * summary aggregate. */
object ClampedBalance {

  /** Per-key balance summary from integer flow cells (k, d, net):
    * (k, n_days, final_balance, max_balance, zero_days). */
  def clampedSummary(flows: DataFrame): DataFrame = {
    val wCum = Window.partitionBy("k").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flows
      .filter(col("d").isNotNull && col("net").isNotNull)
      .withColumn("s", sum("net").over(wCum))
      .withColumn("m", min("s").over(wCum))
      .withColumn("b", expr("s - least(CAST(0 AS BIGINT), m)"))
      .groupBy("k")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_days"),
        expr("CAST(max_by(b, d) AS BIGINT)").as("final_balance"),
        expr("CAST(max(b) AS BIGINT)").as("max_balance"),
        expr("CAST(sum(CAST(b = 0 AS BIGINT)) AS BIGINT)").as("zero_days"))
  }

  /** q301: per-part stock-on-hand under the drop policy — returns
    * (l_returnflag = 'R') restock, everything else ships out; the
    * clamp is the "you cannot ship what you do not hold" floor. A
    * stride-probe part subset (the q24/q295 discipline). */
  val ProbeStride = 50

  def partStockBalance(spark: SparkSession, dir: String): DataFrame =
    clampedSummary(Tables.lineitem(spark, dir)
      .filter(col("l_partkey").isNotNull && col("l_shipdate").isNotNull &&
        col("l_quantity").isNotNull &&
        col("l_partkey") % ProbeStride === 0)
      .selectExpr("l_partkey AS k",
        "datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity" +
          " ELSE -l_quantity END AS BIGINT) AS q")
      .groupBy("k", "d")
      .agg(expr("CAST(sum(q) AS BIGINT)").as("net")))
      .withColumnRenamed("k", "l_partkey")

  /** DuckDB twin: identical cells and the same two-window reflection. */
  val partStockBalanceSql: String =
    s"""WITH flows AS (
       |  SELECT l_partkey AS k,
       |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d,
       |    CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
       |      ELSE -l_quantity END AS BIGINT)) AS BIGINT) AS net
       |  FROM lineitem
       |  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
       |    AND l_quantity IS NOT NULL AND l_partkey % $ProbeStride = 0
       |  GROUP BY 1, 2),
       |sums AS (
       |  SELECT k, d,
       |    CAST(sum(net) OVER (PARTITION BY k ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
       |  FROM flows),
       |walked AS (
       |  SELECT k, d, s,
       |    CAST(min(s) OVER (PARTITION BY k ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m
       |  FROM sums),
       |bal AS (
       |  SELECT k, d, s - least(CAST(0 AS BIGINT), m) AS b FROM walked)
       |SELECT k AS l_partkey, CAST(count(*) AS BIGINT) AS n_days,
       |  CAST(max_by(b, d) AS BIGINT) AS final_balance,
       |  CAST(max(b) AS BIGINT) AS max_balance,
       |  CAST(sum(CAST(b = 0 AS BIGINT)) AS BIGINT) AS zero_days
       |FROM bal GROUP BY 1""".stripMargin
}
