package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * file/row-group skipping: sorting 100 TB by `(a)` prunes scans that
  * filter on `a` but does nothing for `b`; sorting by the bit-
  * interleaved Z-value of `(a, b, …)` gives every dimension partial
  * locality, so min/max statistics prune files for predicates on ANY
  * clustered column (the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER`; public Morton-curve construction).
  *
  * [[zvalue]] is pure integer bit arithmetic (`shiftleft`/`|`/`&` —
  * whole-stage codegen, no UDFs): each column is normalized to a
  * [[Bits]]-bit rank via driver-computed min/max (one dimension-grade
  * stats job — the q60 precedent), then bit i of dimension j lands at
  * interleaved position `i·dims + j`. [[layout]] range-partitions by
  * the Z-value and sorts within partitions — exactly the
  * [[graft.sinks.PartitionedParquet]] write shape, so row-group
  * min/max skipping works on every clustered dimension.
  *
  * Locality is the spec'd property: a query box tight in ONE dimension
  * touches a bounded fraction of Z-laid-out partitions but ALL
  * partitions of a layout sorted by the other dimension.
  */
object Zorder {

  /** Bits per dimension (two dims ⇒ 32-bit Z-values: plenty for
    * file-level clustering; raise for >3 dims only if needed). */
  val Bits = 16

  /** Interleave already-normalized non-negative int columns (each in
    * [0, 2^bits)): bit i of norms(j) → Z bit i·dims + j. */
  def interleave(norms: Seq[Column], bits: Int = Bits): Column = {
    val d = norms.size
    val terms = for {
      i <- 0 until bits
      j <- norms.indices
    } yield shiftleft(shiftright(norms(j), i).bitwiseAND(lit(1L)),
      i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Normalize a numeric column to a [0, 2^bits) rank given its
    * driver-known [lo, hi] range. */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int = Bits): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits) - 1))
        .cast("long")))
  }

  /** Append a `_z` column over `cols` (one stats job for the ranges). */
  def withZvalue(df: DataFrame, cols: Seq[String], bits: Int = Bits): DataFrame = {
    val rangeCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"lo_$c"),
        max(col(c)).cast("double").as(s"hi_$c")))
    val stats = df.agg(rangeCols.head, rangeCols.tail: _*).head()
    val norms = cols.map { c =>
      normalize(col(c), stats.getAs[Double](s"lo_$c"),
        stats.getAs[Double](s"hi_$c"), bits)
    }
    df.withColumn("_z", interleave(norms, bits))
  }

  /** Z-clustered layout: range-partition by `_z` into `numParts`,
    * sort within partitions — write-ready for min/max skipping. */
  def layout(df: DataFrame, cols: Seq[String], numParts: Int,
      bits: Int = Bits): DataFrame = {
    val z = withZvalue(df, cols, bits)
    z.repartitionByRange(numParts, col("_z")).sortWithinPartitions("_z")
  }
}
