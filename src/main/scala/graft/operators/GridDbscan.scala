package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Components

/** Grid-density clustering (DBSCAN's grid variant) — the CLUSTERING
  * rung of the geo deck: q33/q55 join points to known shapes, q122
  * finds neighbors of a QUERY point; this DISCOVERS the dense regions
  * themselves with no shape catalog — "where are the hot zones?" —
  * the classic density-clustering question, answered the way it
  * scales: snap points to grid cells, keep cells with ≥ minPts
  * points, union 8-adjacent dense cells into components. (Documented
  * delta vs point-level DBSCAN: border points in a sparse cell
  * adjacent to a dense cell count as noise here — the grid
  * approximation that makes the operator one aggregate + one
  * dimension-grade component pass instead of a per-point radius
  * join.)
  *
  * Exactness: fully integral — offset-then-div cell snapping (no
  * negative-division ambiguity), BIGINT cell keys, integer counts;
  * cluster_id = min member cell key (the q39 min-id convention).
  *
  * Plan/scale: ONE corpus-touch cell aggregate (map-side combined) →
  * the dense-cell frame is bounded by GRID AREA, not corpus size (the
  * q48 range-bound class) → an 8-offset self-join on the broadcast
  * dense set → [[Components]] pointer-jumping CC over cell nodes →
  * a keyed summary. Points never meet a join or a window. */
object GridDbscan {

  /** Lat/lon micro-degree offsets making every coordinate
    * non-negative before cell division. */
  val LatOff = 40000000L
  val LonOff = 170000000L
  /** Row stride for packing (cx, cy) into one BIGINT key: cy spans
    * 340°/cellW, far under 10⁶ at any supported width > 340 µdeg;
    * max key ≈ (80°/cellW)·10⁶ stays ≤ ~8e10 — comfortable BIGINT. */
  val Stride = 1000000L

  /** Cluster summary from points (px, py) in micro-degrees:
    * (cluster_id, n_cells, n_points), one row per dense-cell
    * component, cluster_id = min member cell key. */
  def gridDbscan(points: DataFrame, cellW: Long, minPts: Long): DataFrame = {
    require(340000000L / cellW < Stride,
      s"cellW=$cellW packs cy past the $Stride stride")
    val dense = points
      .selectExpr(s"(px + $LatOff) div $cellW AS cx",
        s"(py + $LonOff) div $cellW AS cy")
      .groupBy("cx", "cy")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .filter(col("cnt") >= minPts)
      .selectExpr(s"cx * $Stride + cy AS cell", "cx", "cy", "cnt")
      .localCheckpoint(true) // edge sides + summary all read it
    val offsets = dense.sparkSession.range(9)
      .selectExpr("CAST(id div 3 AS BIGINT) - 1 AS dx",
        "CAST(id % 3 AS BIGINT) - 1 AS dy")
    val edges = dense.select("cell", "cx", "cy")
      .crossJoin(broadcast(offsets))
      .selectExpr("cell", s"(cx + dx) * $Stride + (cy + dy) AS ncell")
      .join(broadcast(dense.select(col("cell").as("ncell"))), "ncell")
      .filter(col("cell") < col("ncell"))
      .selectExpr("cell AS doc_a", "ncell AS doc_b")
    Components.connectedComponents(
      edges, dense.select(col("cell").as("doc_id")))
      .join(broadcast(dense.select(col("cell").as("doc_id"), col("cnt"))),
        "doc_id")
      .groupBy("cluster_id")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_cells"),
        expr("CAST(sum(cnt) AS BIGINT)").as("n_points"))
  }

  /** Registered grid: 5° cells, 3-point density floor. */
  val CellW = 5000000L
  val MinPts = 3L

  /** q208: where do customers CLUSTER on the key-derived coordinate
    * field (the q122 synthetic geography) — the density map with no
    * shape catalog, 5° cells, minPts = 3. */
  def customerHotZones(spark: SparkSession, dir: String): DataFrame =
    gridDbscan(Tables.customer(spark, dir)
      .selectExpr(
        s"CAST((c_custkey * 7919) % 80000000 - $LatOff AS BIGINT) AS px",
        s"CAST((c_custkey * 104729) % 340000000 - $LonOff AS BIGINT) AS py"),
      CellW, MinPts)

  /** DuckDB twin: identical cells and edges, recursive min-label
    * reach for the components (the q39 oracle idiom). */
  val customerHotZonesSql: String =
    s"""WITH RECURSIVE pts AS (
       |  SELECT CAST((c_custkey * 7919) % 80000000 - $LatOff AS BIGINT) AS px,
       |    CAST((c_custkey * 104729) % 340000000 - $LonOff AS BIGINT) AS py
       |  FROM customer),
       |dense AS (
       |  SELECT cx * $Stride + cy AS cell, cx, cy, cnt
       |  FROM (
       |    SELECT (px + $LatOff) // $CellW AS cx,
       |      (py + $LonOff) // $CellW AS cy,
       |      CAST(count(*) AS BIGINT) AS cnt
       |    FROM pts GROUP BY 1, 2)
       |  WHERE cnt >= $MinPts),
       |offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
       |  (1,-1),(1,0),(1,1)),
       |edges0 AS (
       |  SELECT d.cell AS doc_a, n.cell AS doc_b
       |  FROM dense d CROSS JOIN offs
       |  JOIN dense n ON n.cell = (d.cx + dx) * $Stride + (d.cy + dy)
       |  WHERE d.cell < n.cell),
       |sym AS (
       |  SELECT doc_a AS node, doc_b AS nbr FROM edges0
       |  UNION ALL
       |  SELECT doc_b AS node, doc_a AS nbr FROM edges0),
       |reach AS (
       |  SELECT cell AS node, cell AS label FROM dense
       |  UNION
       |  SELECT e.node, r.label FROM sym e JOIN reach r ON r.node = e.nbr),
       |lab AS (SELECT node AS cell, min(label) AS cluster_id
       |        FROM reach GROUP BY 1)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
       |  CAST(sum(cnt) AS BIGINT) AS n_points
       |FROM lab JOIN dense USING (cell)
       |GROUP BY 1""".stripMargin
}
