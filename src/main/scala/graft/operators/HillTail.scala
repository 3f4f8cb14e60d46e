package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Hill tail-index estimator — "how heavy is the tail, really?", the
  * extreme-value question the concentration deck stops short of: q117
  * Pareto SHOWS the 80/20 shape, q108/q187 summarize inequality, but
  * none of them yields the tail exponent α that says whether the next
  * decade of data even HAS a finite variance (α < 2) or mean (α < 1)
  * — the number capacity planning and whale-risk models need.
  *
  *   Hill_k = (1/k)·Σ_{i≤k} ln(x_(i)/x_(k)),   α̂ = 1/Hill_k
  *
  * over the k largest observations (k = top 1%, computed exactly as
  * n div 100, floored at 10).
  *
  * Exactness: order statistics come from VALUE CELLS walked from the
  * top — a cell straddling the k-boundary contributes exactly
  * m = min(cnt, k − cumAbove) of its multiplicity, so the selection is
  * integer-exact with no row-level sort; ln is snapped per CELL to the
  * 1e-9 nano-nat grid (the q110 discipline — one snap per DISTINCT
  * value, not per row) and Σ m·⌊ln x⌉ accumulates as an exact
  * DECIMAL(38,0); the final Hill/α pair is one shared-text double.
  *
  * Plan/scale: one keyed cell aggregate → a descending cumulative
  * walk over cells via [[BandedCumsum]] (per-task work capped at
  * bandWidth ABSOLUTELY — revenue-sum cells are near-unique per
  * customer, so an unbanded per-group window would grow with the
  * customer count, not the value range) → one keyed finish. Group
  * totals are a dimension-grade aggregate broadcast back. The corpus
  * is touched once. */
object HillTail {

  /** Hill estimator per group from a frame with (g, x): group key and
    * positive BIGINT value. Returns one row per group:
    * (g, n_rows, k_tail, x_k, hill, alpha) — NULL when the tail is
    * degenerate (x_(k) = x_(1), all tail values equal). */
  def hillTail(values: DataFrame): DataFrame = {
    val cells = values.filter(col("x") > 0)
      .groupBy("g", "x")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // feeds the banded walk AND the totals
    val totals = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt) AS BIGINT)").as("n_rows"))
    // descending cumulative = ascending banded cumsum over -x;
    // inclusive-minus-self gives the strict-above count exactly
    BandedCumsum.cumsum(cells.withColumn("negx", -col("x")),
        Seq("g"), "negx", Seq("cnt"), inputCheckpointed = true)
      .withColumn("cum_above", col("cum_cnt") - col("cnt"))
      .drop("negx", "cum_cnt")
      .join(broadcast(totals), "g")
      .withColumn("k_tail", expr("greatest(n_rows div 100, 10)"))
      .filter(col("cum_above") < col("k_tail"))
      .withColumn("m", expr("least(cnt, k_tail - cum_above)"))
      .withColumn("l", expr(
        "CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)"))
      .groupBy("g")
      .agg(
        expr("CAST(max(n_rows) AS BIGINT)").as("n_rows"),
        expr("CAST(max(k_tail) AS BIGINT)").as("k_tail"),
        expr("CAST(sum(m) AS BIGINT)").as("k_used"),
        expr("CAST(min(x) AS BIGINT)").as("x_k"),
        expr("CAST(sum(CAST(m AS DECIMAL(38,0)) * l) AS DECIMAL(38,0))")
          .as("sml"),
        expr("CAST(min(l) AS BIGINT)").as("l_k")) // ln monotone: l of x_k
      .selectExpr("g", "n_rows", "k_tail", "x_k",
        s"round($HillSql, 6) + 0.0 AS hill")
      .selectExpr("g", "n_rows", "k_tail", "x_k", "hill",
        "round(1.0 / nullif(hill, 0.0), 6) + 0.0 AS alpha")
  }

  /** Shared-text Hill mean: Σm·(⌊ln x⌉ − ⌊ln x_k⌉) / (k·1e9) — NULL
    * via nullif when every tail value equals x_k. */
  private val HillSql =
    "(nullif(CAST(sml AS DOUBLE) - CAST(k_used AS DOUBLE)" +
      " * CAST(l_k AS DOUBLE), 0.0) / 1e9 / CAST(k_used AS DOUBLE))"

  /** q188: the tail exponent of customer lifetime revenue per segment
    * — is the whale tail Pareto-heavy enough to dominate the mean? */
  def revenueTailIndex(spark: SparkSession, dir: String): DataFrame =
    hillTail(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .groupBy("o_custkey")
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("x"))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g", "x"))
      .withColumnRenamed("g", "c_mktsegment")

  /** DuckDB twin: identical cells, boundary split, snaps, finish. */
  val revenueTailIndexSql: String =
    s"""WITH base AS (
       |  SELECT c_mktsegment AS g, x
       |  FROM (
       |    SELECT o_custkey,
       |      CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
       |    FROM orders
       |    WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
       |    GROUP BY 1)
       |  JOIN customer ON o_custkey = c_custkey
       |  WHERE x > 0),
       |cells AS (
       |  SELECT g, x, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2),
       |walked AS (
       |  SELECT *,
       |    coalesce(CAST(sum(cnt) OVER (PARTITION BY g ORDER BY x DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cum_above,
       |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n_rows
       |  FROM cells),
       |tail_cells AS (
       |  SELECT g, x, n_rows, greatest(n_rows // 100, 10) AS k_tail,
       |    least(cnt, greatest(n_rows // 100, 10) - cum_above) AS m,
       |    CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT) AS l
       |  FROM walked WHERE cum_above < greatest(n_rows // 100, 10)),
       |agg AS (
       |  SELECT g, CAST(max(n_rows) AS BIGINT) AS n_rows,
       |    CAST(max(k_tail) AS BIGINT) AS k_tail,
       |    CAST(sum(m) AS BIGINT) AS k_used,
       |    CAST(min(x) AS BIGINT) AS x_k,
       |    CAST(sum(CAST(m AS HUGEINT) * l) AS HUGEINT) AS sml,
       |    CAST(min(l) AS BIGINT) AS l_k
       |  FROM tail_cells GROUP BY 1),
       |hill AS (
       |  SELECT g, n_rows, k_tail, x_k, round($HillSql, 6) + 0.0 AS hill
       |  FROM agg)
       |SELECT g AS c_mktsegment, n_rows, k_tail, x_k, hill,
       |  round(1.0 / nullif(hill, 0.0), 6) + 0.0 AS alpha
       |FROM hill""".stripMargin
}
