package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based aggregates for fact-scale profiling — the bounded-
  * memory companions to the exact operators (the q31 profile's
  * count_distinct buffers every key per group; these keep a fixed-size
  * HyperLogLog++ sketch per group that merges map-side, the only shape
  * that survives a 100 TB scan with high-cardinality keys).
  *
  * Sketch estimates are engine-specific by nature (like
  * `Relational.percentilesApprox`), so these are spec-verified against
  * the exact operators rather than oracle-hashed.
  */
object Sketches {

  /** Per-group approximate distinct count of `valueCol` with relative
    * standard deviation `rsd` (HLL++; constant memory per group). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"${valueCol}_distinct_est"))

  /** Exact twin (for specs and small groups). */
  def exactDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as(s"${valueCol}_distinct"))
}
