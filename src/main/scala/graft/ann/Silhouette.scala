package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** Simplified silhouette — the FIT-QUALITY readout for the clustering
  * family: q45 fits k-means, q56/q25b/q145 consume its cells, but
  * nothing reports whether the clusters are TIGHT or mushy — the
  * number that adjudicates "is k right" before a SemDeDup threshold
  * or an IVF probe count is tuned on top. The simplified (centroid-
  * based) silhouette replaces the classic all-pairs a/b with distances
  * to centroids — O(n·k), the standard large-scale form (the classic
  * form is O(n²) and exists only in textbooks at corpus scale):
  *
  *   a = 1 − cos(v, own centroid)     (cosine distance — the q45
  *   b = 1 − cos(v, nearest other)     assignment's own geometry)
  *   s = (b − a)/max(a, b) = (cos₁ − cos₂)/(1 − cos₂)   since b ≥ a
  *
  * (cos₁ ≥ cos₂ by the assignment argmax, so max(a,b) = b always —
  * the simplification is exact, documented, and shared.)
  *
  * Exactness: cos₁/cos₂ come from the SAME native fold the q45
  * oracle already hash-matches (bit-identical doubles both engines);
  * s is one shared-text chain per row, floored to 1e-6 micro-units
  * and summed as BIGINTs (the q91 micro-sum move — order-free);
  * degenerate 1 − cos₂ ≤ 1e-12 (a duplicate-direction centroid pair)
  * contributes s = 0 by CASE.
  *
  * Plan/scale: the fit is the q45 eager driver step (k·dim doubles);
  * scoring is ONE projection against literal centroids (no joins, no
  * windows — the per-vector top-2 rides the same sorted-array
  * election as the q45 assignment) → one keyed aggregate. */
object Silhouette {

  private val SSql =
    "CASE WHEN (1e0 - cos2) > 1e-12 THEN (cos1 - cos2) / (1e0 - cos2)" +
      " ELSE 0e0 END"

  /** Per-cluster simplified silhouette for a fitted centroid set.
    * One row per cluster: (cluster, n_vecs, mean_cos, mean_sil). */
  def silhouette(emb: DataFrame, cent: Seq[(Int, Seq[Double])]): DataFrame = {
    require(cent.size >= 2, s"needs k >= 2 centroids, got ${cent.size}")
    val scored = reverse(array_sort(array(cent.map { case (cid, cv) =>
      struct(VectorMath.cosineFast(col("v"), typedLit(cv)).as("cos"),
        lit(cid).as("cell"))
    }.toIndexedSeq: _*)))
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("top", scored)
      .select(
        element_at(col("top"), 1).getField("cell").as("cluster"),
        element_at(col("top"), 1).getField("cos").as("cos1"),
        element_at(col("top"), 2).getField("cos").as("cos2"))
      .groupBy("cluster")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_vecs"),
        expr("CAST(sum(CAST(floor(cos1 * 1e6) AS BIGINT)) AS BIGINT)")
          .as("sc_i"),
        expr(s"CAST(sum(CAST(floor(($SSql) * 1e6) AS BIGINT)) AS BIGINT)")
          .as("ss_i"))
      .selectExpr("cluster", "n_vecs",
        "round(CAST(sc_i AS DOUBLE) / 1e6 / CAST(n_vecs AS DOUBLE), 6)" +
          " + 0.0 AS mean_cos",
        "round(CAST(ss_i AS DOUBLE) / 1e6 / CAST(n_vecs AS DOUBLE), 6)" +
          " + 0.0 AS mean_sil")
  }

  /** q220: how tight are the q45 clusters — per-cluster silhouette of
    * the SAME fit every downstream cell consumer (q56 SemDeDup, q25b
    * IVF, q145 IVFADC) partitions by; a mushy cluster here is a
    * mis-calibrated threshold there. */
  def kmeansSilhouette(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    silhouette(emb, Kmeans.fit(emb))
  }

  /** DuckDB twin: the q45 fit CTEs, a top-2 pivot on the identical
    * (cos DESC, cell DESC) election, the shared s chain. */
  val kmeansSilhouetteSql: String = {
    val cos = VectorMath.cosineSql("e.v", "c.v", Ann.Dim)
    s"""WITH ${Kmeans.fitCtesSql},
       |top2 AS (
       |  SELECT vec_id,
       |    max(CASE WHEN rk = 1 THEN cell END) AS cluster,
       |    max(CASE WHEN rk = 1 THEN cos END) AS cos1,
       |    max(CASE WHEN rk = 2 THEN cos END) AS cos2
       |  FROM (
       |    SELECT e.vec_id, c.cell, $cos AS cos,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $cos DESC, c.cell DESC) AS rk
       |    FROM emb e CROSS JOIN cent2 c)
       |  WHERE rk <= 2 GROUP BY vec_id),
       |agg AS (
       |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
       |    CAST(sum(CAST(floor(cos1 * 1e6) AS BIGINT)) AS BIGINT) AS sc_i,
       |    CAST(sum(CAST(floor(($SSql) * 1e6) AS BIGINT)) AS BIGINT) AS ss_i
       |  FROM top2 GROUP BY 1)
       |SELECT cluster, n_vecs,
       |  round(CAST(sc_i AS DOUBLE) / 1e6 / CAST(n_vecs AS DOUBLE), 6)
       |    + 0.0 AS mean_cos,
       |  round(CAST(ss_i AS DOUBLE) / 1e6 / CAST(n_vecs AS DOUBLE), 6)
       |    + 0.0 AS mean_sil
       |FROM agg""".stripMargin
  }
}
