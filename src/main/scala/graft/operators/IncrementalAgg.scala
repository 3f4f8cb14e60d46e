package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — materialized-view upkeep for
  * rollups: instead of recomputing a grouped aggregate over 100 TB
  * because one day of data arrived, keep the rollup as MERGEABLE
  * sufficient statistics and fold each new batch in with a
  * partial-aggregate + merge pass that only touches the DELTA and the
  * (dimension-grade) stored state. The reference's daily Airflow
  * full-recompute (`district_gis_etl.py` daily DAG) becomes O(delta)
  * instead of O(history).
  *
  * State schema per group key: `n` (count), `sum_fp` (Σ floor(x·1e4)
  * as exact BIGINT — the q32 fixed-point trick, so merge order can
  * never change a result), `vmin`, `vmax`. Every statistic is
  * associative+commutative, so `merge(merge(a,b),c) = merge(a,
  * merge(b,c))` and incremental == full recompute EXACTLY
  * (spec-asserted, including on out-of-order batch folds). Derived
  * view: `mean = sum_fp div n / 1e4` (integer division — no float
  * accumulation anywhere).
  *
  * Plan shape: `partial(delta)` is one map-side-combined aggregate of
  * the batch; `merge` is a union + re-aggregate of two
  * dimension-grade state frames — the fact table is touched once per
  * batch, ever. Pair with [[graft.sinks.ReplaceSink]] (state swap) or
  * [[graft.sinks.KeyedOverwriteSink]] (per-partition state) for the
  * storage side.
  *
  * Streaming-native for free: mergeable sufficient statistics are
  * exactly what Structured Streaming's state store maintains, so
  * [[partial]] applied to a streaming frame IS the continuously-
  * updated rollup (StreamingSpec asserts stream-vs-batch parity with
  * zero additional code).
  */
object IncrementalAgg {

  /** Partial state for one batch of (key, x) rows. */
  def partial(batch: DataFrame, keyCol: String, valCol: String): DataFrame =
    batch.groupBy(col(keyCol).as("key"))
      .agg(
        count(valCol).as("n"),
        sum(expr(s"CAST(floor($valCol * 10000) AS BIGINT)")).as("sum_fp"),
        min(valCol).as("vmin"),
        max(valCol).as("vmax"))

  /** Merge two state frames (either may be empty). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("key")
      .agg(
        sum("n").as("n"),
        sum("sum_fp").as("sum_fp"),
        min("vmin").as("vmin"),
        max("vmax").as("vmax"))

  /** Render the user-facing view from state. */
  def view(state: DataFrame): DataFrame =
    state.select(col("key"), col("n"),
      (round(expr("CAST(sum_fp div n AS DOUBLE) / 10000.0"), 4) + 0.0)
        .as("mean"),
      col("vmin"), col("vmax"))
}
