package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Degree assortativity (Newman 2002) — the graph-SHAPE scalar the
  * graph deck was missing: q65 ranks nodes, q77 counts closure, q147
  * finds communities; assortativity answers "do hubs link to hubs
  * (r > 0, social-style) or to leaves (r < 0, hub-and-spoke)?" — the
  * single number that predicts how a graph fragments under node loss
  * and how skewed a join on its edges will run.
  *
  * r = Pearson correlation of (deg(u), deg(v)) over directed arcs of
  * the symmetrized graph (each undirected edge contributes both
  * directions, the standard undirected convention — making Σdu = Σdv
  * by construction).
  *
  * Exactness: degrees are exact BIGINT counts; all six sufficient
  * statistics (m, Σdu, Σdv, Σdu², Σdv², Σdu·dv) are exact
  * DECIMAL(38,0) sums — order-free; r is ONE shared-text chain on
  * exactly-recovered doubles (the q134 correctly-rounded-cast rule),
  * zero-variance (regular graph) → NULL.
  *
  * Plan/scale: one degree aggregate, two key joins to decorate arcs
  * (degree frames are node-grade — shuffle joins, no broadcast
  * assumption), one global map-side-combined aggregate. No windows,
  * no iteration. */
object Assortativity {

  private val CovSql = "(md * sxy - sx * sy)"
  private val VxSql = "(md * sxx - sx * sx)"
  private val VySql = "(md * syy - sy * sy)"

  /** Assortativity of a symmetrized (src, dst) arc list. One row:
    * (n_nodes, n_arcs, assortativity). */
  def assortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(
      expr("CAST(count(1) AS BIGINT)").as("d"))
    e
      .join(deg, "src")
      .join(deg.select(col("src").as("dst"), col("d").as("d2")), "dst")
      .selectExpr("d AS du", "d2 AS dv")
      .agg(
        expr("CAST(count(1) AS DECIMAL(38,0))").as("m"),
        expr("CAST(sum(CAST(du AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sxi"),
        expr("CAST(sum(CAST(dv AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("syi"),
        expr("CAST(sum(CAST(du AS DECIMAL(38,0)) * du) AS DECIMAL(38,0))").as("sxxi"),
        expr("CAST(sum(CAST(dv AS DECIMAL(38,0)) * dv) AS DECIMAL(38,0))").as("syyi"),
        expr("CAST(sum(CAST(du AS DECIMAL(38,0)) * dv) AS DECIMAL(38,0))").as("sxyi"))
      .crossJoin(broadcast(deg.agg(
        expr("CAST(count(1) AS BIGINT)").as("n_nodes"))))
      .selectExpr("n_nodes", "CAST(m AS BIGINT) AS n_arcs",
        "CAST(m AS DOUBLE) AS md",
        "CAST(sxi AS DOUBLE) AS sx", "CAST(syi AS DOUBLE) AS sy",
        "CAST(sxxi AS DOUBLE) AS sxx", "CAST(syyi AS DOUBLE) AS syy",
        "CAST(sxyi AS DOUBLE) AS sxy")
      .selectExpr("n_nodes", "n_arcs",
        s"CASE WHEN $VxSql > 0e0 AND $VySql > 0e0 THEN" +
          s" round($CovSql / sqrt($VxSql * $VySql), 6) + 0.0 END" +
          " AS assortativity")
  }

  /** q218: the supplier–part supplies graph (the q65 node space) —
    * bipartite procurement graphs run DISassortative when big
    * suppliers serve long-tail parts; a drift toward 0 reads as
    * consolidation. */
  def supplierPartAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val sp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    assortativity(
      sp.selectExpr("s * 2 AS src", "p * 2 + 1 AS dst")
        .unionByName(sp.selectExpr("p * 2 + 1 AS src", "s * 2 AS dst")))
  }

  /** DuckDB twin: identical degree decorate and shared chain. */
  val supplierPartAssortativitySql: String =
    s"""WITH sp AS (
       |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |e AS (
       |  SELECT s * 2 AS src, p * 2 + 1 AS dst FROM sp
       |  UNION ALL
       |  SELECT p * 2 + 1 AS src, s * 2 AS dst FROM sp),
       |deg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
       |arcs AS (
       |  SELECT a.d AS du, b.d AS dv
       |  FROM e JOIN deg a ON e.src = a.src JOIN deg b ON e.dst = b.src),
       |sums AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS m,
       |    CAST(sum(CAST(du AS HUGEINT)) AS HUGEINT) AS sxi,
       |    CAST(sum(CAST(dv AS HUGEINT)) AS HUGEINT) AS syi,
       |    CAST(sum(CAST(du AS HUGEINT) * du) AS HUGEINT) AS sxxi,
       |    CAST(sum(CAST(dv AS HUGEINT) * dv) AS HUGEINT) AS syyi,
       |    CAST(sum(CAST(du AS HUGEINT) * dv) AS HUGEINT) AS sxyi
       |  FROM arcs),
       |rec AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       |    CAST(m AS BIGINT) AS n_arcs,
       |    CAST(m AS DOUBLE) AS md,
       |    CAST(sxi AS DOUBLE) AS sx, CAST(syi AS DOUBLE) AS sy,
       |    CAST(sxxi AS DOUBLE) AS sxx, CAST(syyi AS DOUBLE) AS syy,
       |    CAST(sxyi AS DOUBLE) AS sxy
       |  FROM sums)
       |SELECT n_nodes, n_arcs,
       |  CASE WHEN $VxSql > 0e0 AND $VySql > 0e0 THEN
       |    round($CovSql / sqrt($VxSql * $VySql), 6) + 0.0 END
       |    AS assortativity
       |FROM rec""".stripMargin
}
