package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental-maintenance equivalence audit — moves
  * [[IncrementalAgg]] from spec-verified to ORACLE-VERIFIED (the q296
  * doctrine for the materialized-view path). The registered query
  * REALLY maintains the rollup incrementally: the orders fact is
  * split into three disjoint calendar batches, each batch becomes
  * partial state, the states merge OUT OF ORDER (late batch first —
  * the arrival order a backfill produces), and the user view renders
  * from merged state. The DuckDB twin is the one-shot full aggregate.
  * A hash match is the maintenance theorem: fold(deltas) ≡ recompute.
  *
  * Exactness: state is exact by design (counts, 1e-4 fixed-point
  * sums, min/max — all associative-commutative BIGINTs), so merge
  * order cannot move a bit; the view's mean is integer division.
  *
  * Plan/scale: each batch partial is one map-side-combined aggregate
  * over its calendar slice (partition-prunable at 100 TB); merges
  * union dimension-grade state frames only. */
object IncrementalAudit {

  /** q297: per-priority order-value rollup maintained as three
    * out-of-order calendar batches. */
  def incrementalPriorityRollup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS pr", "CAST(o_orderdate AS DATE) AS od",
        "o_totalprice AS v")
      .localCheckpoint(true) // three disjoint batch scans
    def batch(cond: String) =
      IncrementalAgg.partial(base.filter(expr(cond)), "pr", "v")
    val early = batch("od < DATE'1994-01-01'")
    val mid = batch("od >= DATE'1994-01-01' AND od < DATE'1996-01-01'")
    val late = batch("od >= DATE'1996-01-01'")
    // backfill order: latest first, then early, then mid
    IncrementalAgg.view(
      IncrementalAgg.merge(IncrementalAgg.merge(late, early), mid))
      .withColumnRenamed("key", "o_orderpriority")
  }

  /** DuckDB twin: the one-shot recompute the incremental path must
    * equal bit-for-bit. */
  val incrementalPriorityRollupSql: String =
    """SELECT o_orderpriority, CAST(count(o_totalprice) AS BIGINT) AS n,
      |  round(CAST(CAST(sum(CAST(floor(o_totalprice * 10000) AS BIGINT))
      |      AS BIGINT) // CAST(count(o_totalprice) AS BIGINT) AS DOUBLE)
      |    / 10000.0, 4) + 0.0 AS mean,
      |  min(o_totalprice) AS vmin, max(o_totalprice) AS vmax
      |FROM orders
      |WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      |GROUP BY 1""".stripMargin
}
