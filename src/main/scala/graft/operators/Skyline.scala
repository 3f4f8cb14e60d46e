package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Skyline (Pareto-dominance frontier) — the classic multi-criteria
  * DB operator (Börzsönyi 2001) the deck lacks: q13's top-k ranks on
  * ONE axis and q117's Pareto reads concentration; the skyline
  * returns every point no other point beats on BOTH axes — "the
  * efficient frontier", with no weighting choice smuggled in.
  * Registered instance: customers who maximize spend while minimizing
  * order count — the high-value/low-touch frontier per segment.
  *
  * Algorithm: for the 2-D (minimize x, maximize y) skyline the
  * sort-filter identity makes it ONE window pass over VALUE-LEVEL
  * cells: a cell survives iff its y is the maximum at its own x AND
  * strictly exceeds every y at smaller x —
  *
  *   keep ⇔ y = max(y | x) ∧ y > max(y | x' < x)
  *
  * (the second max via RANGE … 1 PRECEDING, so ties in x never see
  * each other — dominance requires strictness in one coordinate).
  *
  * Exactness: pure integers (order counts, cents); both dominance
  * comparisons are integer window maxima. Nothing rounds.
  *
  * Plan/scale: one fact scan → per-customer sums → (g, x, y) cells
  * (value-level) → two windows over cells → filter. The skyline of n
  * i.i.d. points has expected size O(log n) — output stays tiny at
  * any scale; the windows run on cells, never customers. */
object Skyline {

  /** 2-D skyline over (g, x minimize, y maximize) cells carrying a
    * weight column n (pre-aggregated units per cell). Returns the
    * frontier cells (g, x, y, n).
    *
    * Plan note: only the per-x MAXIMUM y can ever reach the frontier,
    * so the window runs over the (g, x, max y) REDUCTION — a shuffle
    * aggregate first, window partitions bounded by the x-RANGE (order
    * counts are load-bounded), never by unit count. The winning cells
    * join back for their weights. */
  def skyline2d(cells: DataFrame): DataFrame = {
    val perX = cells.groupBy("g", "x").agg(max("y").as("ymax"))
    val wBelowX = Window.partitionBy("g").orderBy("x")
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("mx_below", max("ymax").over(wBelowX))
      .filter(col("mx_below").isNull || col("ymax") > col("mx_below"))
      .select(col("g"), col("x"), col("ymax").as("y"))
    frontier.join(cells, Seq("g", "x", "y"))
      .select("g", "x", "y", "n")
  }

  /** q291: the high-value/low-touch customer frontier per market
    * segment — fewest orders, most spend; every cell on it is a
    * customer profile nobody in the segment strictly beats. */
  def segmentValueFrontier(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .groupBy("o_custkey")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("x"),
        expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT)")
          .as("y"))
    skyline2d(perCust
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("g"), col("x"), col("y"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("n")))
      .selectExpr("g AS c_mktsegment", "x AS n_orders",
        "y AS spend_cents", "n AS n_customers")
  }

  /** DuckDB twin: identical cells and window dominance filter. */
  val segmentValueFrontierSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS x,
      |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      |  GROUP BY 1),
      |cells AS (
      |  SELECT c_mktsegment AS g, x, y, CAST(count(*) AS BIGINT) AS n
      |  FROM per_cust JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2, 3),
      |per_x AS (
      |  SELECT g, x, max(y) AS ymax FROM cells GROUP BY 1, 2),
      |walked AS (
      |  SELECT g, x, ymax,
      |    max(ymax) OVER (PARTITION BY g ORDER BY x
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_below
      |  FROM per_x),
      |frontier AS (
      |  SELECT g, x, ymax AS y FROM walked
      |  WHERE mx_below IS NULL OR ymax > mx_below)
      |SELECT g AS c_mktsegment, x AS n_orders, y AS spend_cents,
      |  n AS n_customers
      |FROM frontier JOIN cells USING (g, x, y)""".stripMargin
}
