package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order locality audit — moves [[Zorder]] from spec-verified to
  * ORACLE-VERIFIED (the q296/q297 doctrine, applied to the layout
  * path). The registered query normalizes (order value, order date)
  * to 16-bit ranks, interleaves them into the Morton Z-value with the
  * SAME bit placement [[Zorder.interleave]] uses, buckets rows by the
  * top 8 Z bits (the "file" granularity), and reports each bucket's
  * per-dimension rank span. The twin recomputes the interleave in
  * SQL. Two theorems in one gate: the bit math matches across
  * engines, and the LOCALITY CONTRACT holds — fixing 4 top bits per
  * dimension bounds every bucket's span by 2¹² (asserted in spec; the
  * reason min/max file skipping works on BOTH dimensions at 100 TB).
  *
  * Exactness: normalization is one shared-text double chain into
  * floor/least/greatest (exact BIGINT ranks); the interleave and
  * bucket arithmetic are pure integer bit ops. Nothing rounds.
  *
  * Plan/scale: one corpus scan + a broadcast 1-row stats frame → one
  * keyed aggregate over ≤ 256 buckets. */
object ZorderAudit {

  val Bits = Zorder.Bits // 16 per dimension
  val BucketBits = 8     // top-of-Z bucket granularity (4 per dim)

  /** Shared normalization text: v in [lo, hi] → [0, 2^Bits). */
  private def normSql(v: String, lo: String, hi: String): String =
    s"least(${(1L << Bits) - 1}, greatest(0, CAST(floor((CAST($v AS DOUBLE) - $lo)" +
      s" / (CASE WHEN $hi > $lo THEN $hi - $lo ELSE 1.0 END)" +
      s" * ${(1L << Bits) - 1}) AS BIGINT)))"

  /** Morton interleave of n1/n2 with a pluggable shift syntax:
    * bit i of dim j lands at position i·2 + j (the
    * [[Zorder.interleave]] placement). */
  private def zTerms(shl: (String, Int) => String,
                     shr: (String, Int) => String): String =
    (0 until Bits).flatMap { i =>
      Seq(shl(s"(${shr("n1", i)} & 1)", i * 2),
        shl(s"(${shr("n2", i)} & 1)", i * 2 + 1))
    }.mkString("(", " | ", ")")

  private val ZSpark = zTerms(
    (e, k) => s"shiftleft($e, $k)", (e, k) => s"shiftright($e, $k)")
  private val ZDuck = zTerms(
    (e, k) => s"($e << $k)", (e, k) => s"($e >> $k)")

  /** q298: bucket the order fact by its top-8-bit Z prefix over
    * (total price, order date) and report per-bucket rank spans. */
  def orderZorderAudit(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull && col("o_orderdate").isNotNull)
      .selectExpr("o_totalprice AS v1",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')" +
          " AS DOUBLE) AS v2")
    val stats = base.agg(
      min("v1").as("lo1"), max("v1").as("hi1"),
      min("v2").as("lo2"), max("v2").as("hi2"))
    base.crossJoin(broadcast(stats))
      .selectExpr(
        s"${normSql("v1", "lo1", "hi1")} AS n1",
        s"${normSql("v2", "lo2", "hi2")} AS n2")
      .selectExpr("n1", "n2", s"$ZSpark AS z")
      .groupBy(expr(s"shiftright(z, ${2 * Bits - BucketBits})").as("z_bucket"))
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        expr("CAST(max(n1) - min(n1) AS BIGINT)").as("price_span"),
        expr("CAST(max(n2) - min(n2) AS BIGINT)").as("date_span"))
  }

  /** DuckDB twin: identical normalization, the operator-syntax
    * interleave, identical buckets. */
  val orderZorderAuditSql: String =
    s"""WITH base AS (
       |  SELECT o_totalprice AS v1,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
       |      AS DOUBLE) AS v2
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
       |stats AS (
       |  SELECT min(v1) AS lo1, max(v1) AS hi1,
       |    min(v2) AS lo2, max(v2) AS hi2
       |  FROM base),
       |norms AS (
       |  SELECT ${normSql("v1", "lo1", "hi1")} AS n1,
       |    ${normSql("v2", "lo2", "hi2")} AS n2
       |  FROM base CROSS JOIN stats),
       |zs AS (SELECT n1, n2, $ZDuck AS z FROM norms)
       |SELECT (z >> ${2 * Bits - BucketBits}) AS z_bucket,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(max(n1) - min(n1) AS BIGINT) AS price_span,
       |  CAST(max(n2) - min(n2) AS BIGINT) AS date_span
       |FROM zs GROUP BY 1""".stripMargin
}
