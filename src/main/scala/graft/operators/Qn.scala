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

  /** Sn normal-consistency constant (Rousseeuw & Croux 1993). */
  val SnConsistencySql = "1.1926"

  /** Rousseeuw–Croux Sn over the same value cells — the NESTED-median
    * sibling: Sn = c·lomed_i(himed_{j≠i} |xᵢ − xⱼ|). Where Qn elects
    * one global order statistic from the pair multiset, Sn first asks
    * each point "how far is your typical neighbor" (himed = the
    * (⌊n/2⌋+1)-th of its n−1 distances, capped at n−1 so n = 2
    * degenerates to the single distance) and then takes the weighted
    * low median (⌊(n+1)/2⌋-th) of those per-point answers — same 50%
    * breakdown, ~58% normal efficiency, and the per-point himed
    * column is itself a usable outlyingness readout. Identical
    * integer-order-statistic discipline: per-(g, vᵢ) cumulative
    * counts over merged distances, then a per-g weighted median —
    * both windows bounded by the SAME [[MaxCells]] guard. Groups with
    * n < 2 drop (no j ≠ i distances). */
  def snScale(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val guarded = cells
      .withColumn("n_cells",
        count(lit(1)).over(Window.partitionBy("g")))
      .filter(expr(CellGuard.sqlGuard("snScale", "n_cells", MaxCells)))
      .select("g", "v", "c")
      .localCheckpoint(true)
    val totals = guarded.groupBy("g")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("n_rows"))
      .selectExpr("g", "n_rows",
        "least(n_rows div 2 + 1, n_rows - 1) AS hth",
        "(n_rows + 1) div 2 AS lth")
    // distances from each value cell to EVERY point but itself: other
    // cells contribute c_b at |v_a − v_b|, the own cell c_a − 1 at 0
    val dists = guarded.as("a").join(guarded.as("b"), "g")
      .select(col("g"), col("a.v").as("va"), col("a.c").as("ca"),
        abs(col("a.v") - col("b.v")).as("d"),
        when(col("a.v") === col("b.v"), col("a.c") - 1)
          .otherwise(col("b.c")).as("m"))
      .filter(col("m") > 0)
      .groupBy("g", "va", "d")
      .agg(expr("CAST(max(ca) AS BIGINT)").as("ca"),
        expr("CAST(sum(m) AS BIGINT)").as("md"))
      .withColumn("cum",
        expr("CAST(sum(md) OVER (PARTITION BY g, va ORDER BY d)" +
          " AS BIGINT)"))
    val himed = dists.join(broadcast(totals), "g")
      .filter(expr("cum >= hth AND cum - md < hth"))
      .select(col("g"), col("va"), col("ca"), col("d").as("hm"))
    himed
      .groupBy("g", "hm")
      .agg(expr("CAST(sum(ca) AS BIGINT)").as("w"))
      .withColumn("cumw",
        expr("CAST(sum(w) OVER (PARTITION BY g ORDER BY hm)" +
          " AS BIGINT)"))
      .join(broadcast(totals), "g")
      .filter(expr("cumw >= lth AND cumw - w < lth"))
      .selectExpr("g", "n_rows", "CAST(hm AS BIGINT) AS sn_raw",
        s"round($SnConsistencySql * CAST(hm AS DOUBLE), 4) + 0.0 AS sn")
  }

  /** q244: Sn of order-line quantity per return flag — the nested-
    * median reading beside q240 on the identical frame; where the two
    * disagree materially the spread is asymmetric. */
  def quantitySn(spark: SparkSession, dir: String): DataFrame =
    snScale(Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS g", "CAST(l_quantity AS BIGINT) AS v")
      .groupBy("g", "v")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c")))
      .withColumnRenamed("g", "l_returnflag")

  /** DuckDB twin of [[quantitySn]]: same cells, nested thresholds. */
  val quantitySnSql: String =
    s"""WITH cells AS (
       |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1, 2),
       |totals AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS n_rows,
       |    least(CAST(sum(c) AS BIGINT) // 2 + 1,
       |      CAST(sum(c) AS BIGINT) - 1) AS hth,
       |    (CAST(sum(c) AS BIGINT) + 1) // 2 AS lth
       |  FROM cells GROUP BY 1),
       |dists AS (
       |  SELECT a.g, a.v AS va, CAST(max(a.c) AS BIGINT) AS ca,
       |    abs(a.v - b.v) AS d,
       |    CAST(sum(CASE WHEN a.v = b.v THEN a.c - 1 ELSE b.c END)
       |      AS BIGINT) AS md
       |  FROM cells a JOIN cells b ON a.g = b.g
       |  WHERE (CASE WHEN a.v = b.v THEN a.c - 1 ELSE b.c END) > 0
       |  GROUP BY 1, 2, 4),
       |cumd AS (
       |  SELECT g, va, ca, d, md,
       |    CAST(sum(md) OVER (PARTITION BY g, va ORDER BY d) AS BIGINT)
       |      AS cum
       |  FROM dists),
       |himed AS (
       |  SELECT c.g, va, ca, d AS hm
       |  FROM cumd c JOIN totals t ON c.g = t.g
       |  WHERE cum >= hth AND cum - md < hth),
       |wmed AS (
       |  SELECT g, hm, CAST(sum(ca) AS BIGINT) AS w,
       |    CAST(sum(sum(ca)) OVER (PARTITION BY g ORDER BY hm)
       |      AS BIGINT) AS cumw
       |  FROM himed GROUP BY 1, 2)
       |SELECT m.g AS l_returnflag, n_rows, CAST(hm AS BIGINT) AS sn_raw,
       |  round($SnConsistencySql * CAST(hm AS DOUBLE), 4) + 0.0 AS sn
       |FROM wmed m JOIN totals t ON m.g = t.g
       |WHERE cumw >= lth AND cumw - w < lth""".stripMargin

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
