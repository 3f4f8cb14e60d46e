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

  /** Count-min sketch over a column — the fixed-memory frequency table
    * for heavy-hitter-adjacent questions where q49's exact TakeOrdered
    * needs the full (term, count) aggregate but a CMS needs
    * d·w counters regardless of vocabulary size. Guarantees (Cormode &
    * Muthukrishnan 2005): est ≥ true always (conservative overcount);
    * est ≤ true + eps·N with probability ≥ confidence. Spark merges
    * per-partition sketches map-side; only the d·w counter grid
    * reaches the driver. */
  def countMin(df: DataFrame, valueCol: String, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42)
      : org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(col(valueCol), eps, confidence, seed)

  /** Column consumer for [[countMin]]: annotate every row with the
    * sketch's frequency estimate of its `valueCol` — the "how common is
    * this token/domain/url?" lookup a curation filter wants WITHOUT
    * joining against a full (term, count) aggregate. The sketch ships
    * to executors once as a broadcast (d·w counters, independent of
    * vocabulary size); the probe is a per-row hash, no shuffle, and the
    * input frame's plan/partitioning is untouched.
    *
    * The sketch must have been built over a STRING column with the same
    * values (Spark's CMS hashes strings by their UTF-8 bytes on both
    * the build and probe sides, so build/probe agree exactly).
    * Guarantees carried from the sketch: est ≥ true count always;
    * est ≤ true + eps·N with probability ≥ confidence, per probe. */
  def cmsEstimate(df: DataFrame, sketch: org.apache.spark.util.sketch.CountMinSketch,
      valueCol: String, outCol: String = "cms_est"): DataFrame = {
    require(df.schema(valueCol).dataType == org.apache.spark.sql.types.StringType,
      s"cmsEstimate probes string keys; $valueCol is ${df.schema(valueCol).dataType}")
    val bc = df.sparkSession.sparkContext.broadcast(sketch)
    val probe = udf((v: String) => if (v == null) null else {
      java.lang.Long.valueOf(bc.value.estimateCount(v))
    })
    df.withColumn(outCol, probe(col(valueCol)))
  }
}
