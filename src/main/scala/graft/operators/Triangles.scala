package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Triangle counting + local clustering coefficient — the standard
  * graph-shape statistic for community structure (spam farms on web
  * graphs cluster; organic link neighborhoods do too, differently), and
  * the second graph rung after [[Graph.pagerank]]'s centrality. The
  * reference has no graph surface; this extends the LLM-pipeline graph
  * toolkit (crawl-graph curation) with the same exactness discipline.
  *
  * Algorithm: degree-ordered orientation (Ortmann/Brandes "forward"
  * counting). Each undirected edge {u,v} is stored ONCE, oriented from
  * the endpoint that is smaller under the total order
  * `(degree, id)` — so every node's out-neighborhood in the oriented
  * graph has size O(sqrt(|E|)) regardless of hub skew. Wedges are then
  * oriented-edge pairs (u→v, u→w) with rank(v) < rank(w), and a wedge
  * is a triangle iff the oriented edge v→w exists. Every triangle
  * {u,v,w} with rank u < v < w is found exactly once, as the wedge
  * anchored at its lowest-rank corner.
  *
  * Scale shape: the naive wedge join on an UNORIENTED adjacency
  * explodes as Σ d(v)² — a single 1e6-degree hub yields 1e12 wedges.
  * Orientation caps per-node fan-out at the graph's degeneracy (web
  * graphs: tiny), so the wedge set is near-linear in |E|; both the
  * wedge build (self-join on `src`) and the closure check (equi-join
  * on (v,w)) are plain shuffled hash joins AQE can handle. Per-node
  * counts come from exploding each triangle to its three corners — a
  * 3× fan-out, map-side combined away.
  *
  * Everything is integer (counts) except the clustering coefficient,
  * which is emitted as an exact fixed-point ppm: `(2·T·1e6) div
  * (d·(d−1))` — identical Long arithmetic in the DuckDB twin.
  */
object Triangles {

  /** Per-node triangle counts over an undirected edge list.
    *
    * @param edges (`a`, `b`) Long ids, one row per undirected edge in
    *              either order; duplicates and self-loops are cleaned.
    * @param assumeCanonical skip the cleanup shuffle when the caller
    *              guarantees one row per edge with `a < b` (q77's
    *              support aggregate already does) — one exchange saved.
    * @return (`id`, `degree`, `n_triangles`, `clustering_ppm`).
    * @note endpoint ids must be non-null: a null endpoint is not an
    *       edge — drop such rows upstream (the cleanup path would
    *       silently group them under the null key). */
  def triangles(edges: DataFrame, assumeCanonical: Boolean = false): DataFrame = {
    // the edge list feeds degree counting, orientation, and the closure
    // probe — persist it (and the degree dim) so an expensive upstream
    // edge build (e.g. q77's co-purchase self-join) runs exactly once
    val und = (if (assumeCanonical) edges.select("a", "b")
      else edges.selectExpr("least(a, b) AS a", "greatest(a, b) AS b")
        .filter(col("a") =!= col("b")).distinct()).persist()
    val deg = und.selectExpr("a AS id").unionByName(und.selectExpr("b AS id"))
      .groupBy("id").agg(count(lit(1)).as("d")).persist()
    // orient each edge from the (degree, id)-smaller endpoint
    val oriented = und
      .join(deg.selectExpr("id AS a", "d AS da"), "a")
      .join(deg.selectExpr("id AS b", "d AS db"), "b")
      .selectExpr(
        "CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS src",
        "CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS dst",
        "CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS ddst")
      .persist()
    // wedges anchored at the lowest-rank corner; (v, w) rank-ordered so
    // each candidate pair appears once, matching the storage orientation
    val e1 = oriented.selectExpr("src", "dst AS v", "ddst AS dv")
    val e2 = oriented.selectExpr("src", "dst AS w", "ddst AS dw")
    val wedges = e1.join(e2, "src")
      .filter(expr("dv < dw OR (dv = dw AND v < w)"))
      .select(col("src").as("u"), col("v"), col("w"))
    val tri = wedges.join(
      oriented.selectExpr("src AS v", "dst AS w"), Seq("v", "w"))
    val perNode = tri.selectExpr("u AS id")
      .unionByName(tri.selectExpr("v AS id"))
      .unionByName(tri.selectExpr("w AS id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    val out = deg.join(perNode, Seq("id"), "left")
      .selectExpr("id", "d AS degree",
        "coalesce(n_triangles, 0) AS n_triangles",
        "CASE WHEN d >= 2 THEN (2 * coalesce(n_triangles, 0) * 1000000)" +
          " div (d * (d - 1)) ELSE 0 END AS clustering_ppm")
      .localCheckpoint(true) // materialize before releasing cached frames
    oriented.unpersist(); und.unpersist(); deg.unpersist()
    out
  }

  /** Minimum co-occurrence support for a part pair to count as an
    * edge — the standard market-basket prune. Without it every
    * one-off co-purchase is an edge and the graph densifies with
    * corpus size (avg degree grows ∝ orders/part), which quadratically
    * inflates the wedge set; with it, edge count tracks the REPEATED
    * structure the analysis is after and stays near-linear in parts. */
  val MinSupport = 2L

  /** q77: triangles over the part co-purchase graph — parts are linked
    * when at least [[MinSupport]] orders contain both (per-order pair
    * fan-out is bounded by the order's line count, so the edge build is
    * an equi-join + map-side-combined support count, never a corpus
    * self-join). */
  def partCopurchase(spark: SparkSession, dir: String): DataFrame = {
    // TWO shuffles to the edge list: collect each order's part set
    // (collect_set partial-aggregates map-side; sets are bounded by the
    // order's line count), explode the a<b combinations as a pure
    // projection, then one support count — no corpus self-join, no
    // pre-distinct pass
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .groupBy("ok").agg(collect_set(col("p")).as("ps"))
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= MinSupport)
      .select("a", "b")
    triangles(edges, assumeCanonical = true)
  }

  val partCopurchaseSql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |und AS (
      |  SELECT x.p AS a, y.p AS b
      |  FROM pairs x JOIN pairs y ON x.ok = y.ok AND x.p < y.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (
      |  SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
      |    SELECT a AS id FROM und UNION ALL SELECT b FROM und)
      |  GROUP BY 1),
      |oriented AS (
      |  SELECT
      |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN a ELSE b END AS src,
      |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN b ELSE a END AS dst,
      |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN db.d ELSE da.d END AS ddst
      |  FROM und JOIN deg da ON da.id = und.a JOIN deg db ON db.id = und.b),
      |tri AS (
      |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
      |  FROM oriented e1
      |  JOIN oriented e2 ON e1.src = e2.src
      |    AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))
      |  JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
      |per_node AS (
      |  SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
      |    SELECT u AS id FROM tri
      |    UNION ALL SELECT v FROM tri
      |    UNION ALL SELECT w FROM tri)
      |  GROUP BY 1)
      |SELECT deg.id, deg.d AS degree,
      |  coalesce(n.n_triangles, 0) AS n_triangles,
      |  CASE WHEN deg.d >= 2 THEN (2 * coalesce(n.n_triangles, 0) * 1000000)
      |       // (deg.d * (deg.d - 1)) ELSE 0 END AS clustering_ppm
      |FROM deg LEFT JOIN per_node n ON n.id = deg.id""".stripMargin
}
