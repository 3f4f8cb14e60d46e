package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Rousseeuw–Croux Qn robust scale — the resistant spread estimate
  * beside q71's MAD that does NOT need a location first: Qn is the
  * k-th order statistic of the C(n,2) pairwise distances |xᵢ − xⱼ|
  * (k = C(h,2), h = ⌊n/2⌋ + 1), so it is location-free, 50%
  * breakdown like the MAD, but ~82% efficient at the normal where
  * the MAD is 37% — the recommended default scale in the robust
  * literature, and the right fence width when groups are small or
  * skewed (the MAD of a skewed group under-reads one tail).
  *
  * EXACTNESS: everything is integer order statistics — no
  * interpolation anywhere. The pair multiset is enumerated over
  * VALUE CELLS (v, c): cells (a, b) with v_a < v_b contribute
  * c_a·c_b pairs at distance v_b − v_a, and each cell contributes
  * C(c,2) pairs at distance 0; the k-th order statistic is the
  * smallest d whose cumulative pair count reaches k. Pair counts and
  * k carry as DECIMAL(38,0) (C(n,2) overflows BIGINT near n ≈ 4·10⁹
  * — cell-grade rows only, never the fact path), and the k threshold
  * is compared as 2·cum ⋛ h·(h−1) so no division ever happens.
  *
  * Plan/scale: ONE fact scan → (g, v) cells; the O(cells²) pair
  * self-join is the operator's price and is guarded LOUDLY per group
  * ([[CellGuard]] text, cap [[MaxCells]] — 8192 cells ⇒ ≤ 33M pair
  * rows per group): a continuous un-quantized column fails with the
  * quantize-first fix named, never a silent quadratic blowup. Groups
  * with n < 2 have k = 0 and drop (no pair distances exist). */
object Qn {

  /** Normal-consistency constant (Rousseeuw & Croux 1993). */
  val ConsistencySql = "2.2219"
  /** Per-group value-cell cap: 8192 cells ⇒ ≤ 33.5M pair rows. */
  val MaxCells: Long = 1L << 13

  /** Qn over value cells (g, v, c): BIGINT value, positive count.
    * Returns (g, n_rows, h, qn_raw, qn). */
  def qnScale(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val guarded = cells
      .withColumn("n_cells",
        count(lit(1)).over(Window.partitionBy("g")))
      .filter(expr(CellGuard.sqlGuard("qnScale", "n_cells", MaxCells)))
      .select("g", "v", "c")
      .localCheckpoint(true) // three consumers: both join sides + totals
    val totals = guarded.groupBy("g")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("n_rows"))
      .selectExpr("g", "n_rows", "n_rows div 2 + 1 AS h")
      .selectExpr("g", "n_rows", "h",
        "CAST(h AS DECIMAL(38,0)) * (h - 1) AS k2") // 2k = h(h−1)
    val cross = guarded.as("a")
      .join(guarded.as("b"),
        col("a.g") === col("b.g") && col("a.v") < col("b.v"))
      .select(col("a.g").as("g"), (col("b.v") - col("a.v")).as("d"),
        expr("CAST(a.c AS DECIMAL(38,0)) * b.c").as("np"))
    val zero = guarded.filter(col("c") >= 2)
      .select(col("g"), lit(0L).as("d"),
        expr("CAST(c AS DECIMAL(38,0)) * (c - 1) / 2").as("np"))
    val cum = cross.unionByName(zero)
      .groupBy("g", "d")
      .agg(expr("CAST(sum(np) AS DECIMAL(38,0))").as("npairs"))
      .withColumn("cum",
        expr("CAST(sum(npairs) OVER (PARTITION BY g ORDER BY d)" +
          " AS DECIMAL(38,0))"))
    // the cell CONTAINING the k-th smallest distance: 2·cum ≥ h(h−1)
    // first becomes true here (k = 0 ⇒ no row matches ⇒ group drops)
    cum.join(broadcast(totals), "g")
      .filter(expr("2 * cum >= k2 AND 2 * (cum - npairs) < k2"))
      .selectExpr("g", "n_rows", "h", "CAST(d AS BIGINT) AS qn_raw",
        s"round($ConsistencySql * CAST(d AS DOUBLE), 4) + 0.0 AS qn")
  }

  /** q240: Qn of order-line quantity per return flag — the natively
    * integer column (cells ≤ 50 at any SF), where "how spread are
    * line sizes, robustly" is the inventory question and the q71-style
    * MAD is blunted by the discrete skewed distribution. */
  def quantityQn(spark: SparkSession, dir: String): DataFrame =
    qnScale(Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS g", "CAST(l_quantity AS BIGINT) AS v")
      .groupBy("g", "v")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c")))
      .withColumnRenamed("g", "l_returnflag")

  /** DuckDB twin: identical cell enumeration, integer thresholds, and
    * consistency constant. */
  val quantityQnSql: String =
    s"""WITH cells AS (
       |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1, 2),
       |totals AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS n_rows,
       |    CAST(sum(c) AS BIGINT) // 2 + 1 AS h
       |  FROM cells GROUP BY 1),
       |pairs AS (
       |  SELECT a.g, b.v - a.v AS d, CAST(a.c AS HUGEINT) * b.c AS np
       |  FROM cells a JOIN cells b ON a.g = b.g AND a.v < b.v
       |  UNION ALL
       |  SELECT g, 0 AS d, CAST(c AS HUGEINT) * (c - 1) // 2 AS np
       |  FROM cells WHERE c >= 2),
       |cum AS (
       |  SELECT g, d, CAST(sum(np) AS HUGEINT) AS npairs,
       |    CAST(sum(sum(np)) OVER (PARTITION BY g ORDER BY d)
       |      AS HUGEINT) AS cum
       |  FROM pairs GROUP BY 1, 2)
       |SELECT c.g AS l_returnflag, n_rows, h,
       |  CAST(d AS BIGINT) AS qn_raw,
       |  round($ConsistencySql * CAST(d AS DOUBLE), 4) + 0.0 AS qn
       |FROM cum c JOIN totals t ON c.g = t.g
       |WHERE 2 * cum >= CAST(h AS HUGEINT) * (h - 1)
       |  AND 2 * (cum - npairs) < CAST(h AS HUGEINT) * (h - 1)""".stripMargin
}
