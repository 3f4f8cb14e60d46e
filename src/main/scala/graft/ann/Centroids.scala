package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** Label-centroid similarity matrix — the embedding deck's REPORT
  * layer. The ANN family (q24/q25/q69/q145) answers per-vector
  * queries; a corpus curator's first embedding question is coarser:
  * "how far apart do the label populations sit?" Centroid cosine per
  * label pair is the q140 JS-matrix idea transplanted from token
  * space to embedding space — near-1 pairs are candidate label merges
  * (or leakage), near-0 pairs confirm the labels carve real structure.
  *
  * Exactness: centroid components are 1e-6-floored integer sums per
  * (label, dimension) — order-free exact BIGINTs — recovered as ONE
  * rational per component; the centroid arrays are rebuilt in
  * DIMENSION ORDER in both engines and the pairwise cosine runs the
  * house fold (native [[VectorMath]] expression ≡ DuckDB list_reduce,
  * the q24 contract) over bitwise-identical inputs.
  *
  * Plan/scale: one corpus scan → posexplode to (label, dim) cells
  * (64·labels rows after ONE map-side-combined aggregate) → per-label
  * array rebuild → a labels² broadcast pair join. Corpus size only
  * touches the first aggregate; everything after is dimension-grade. */
object Centroids {

  val Dim = Ann.Dim

  /** Per-label centroids and pairwise cosine from (label, embedding).
    * One row per unordered pair la < lb:
    * (label_a, label_b, n_a, n_b, cos_centroid). */
  def centroidSimilarity(emb: DataFrame): DataFrame = {
    val cells = emb
      .filter(col("label").isNotNull && col("embedding").isNotNull)
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("label"), col("pos"))
      .agg(
        expr("CAST(sum(CAST(floor(col * 1e6) AS BIGINT)) AS BIGINT)").as("s"),
        expr("CAST(count(1) AS BIGINT)").as("n"))
    val cents = cells
      .withColumn("c", expr(
        "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6"))
      .groupBy("label")
      .agg(
        expr("CAST(max(n) AS BIGINT)").as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(pos, c)))," +
          " x -> x.c)").as("cv"))
    val a = cents.selectExpr("label AS label_a", "n_vecs AS n_a", "cv AS va")
    val b = cents.selectExpr("label AS label_b", "n_vecs AS n_b", "cv AS vb")
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .withColumn("cos_centroid",
        round(VectorMath.cosineFast(col("va"), col("vb")), 6) + lit(0.0))
      .select("label_a", "label_b", "n_a", "n_b", "cos_centroid")
  }

  /** q292: how separable are the embedding corpus's labels at the
    * population level — the merge/leakage screen run before any
    * per-vector ANN work. */
  def labelCentroidSim(spark: SparkSession, dir: String): DataFrame =
    centroidSimilarity(Tables.embeddings(spark, dir))

  /** DuckDB twin: zipped unnest cells, identical fixed-point
    * components, ordered list rebuild, the house fold. */
  val labelCentroidSimSql: String =
    s"""WITH expl AS (
       |  SELECT label,
       |    unnest(CAST(embedding AS DOUBLE[])) AS x,
       |    unnest(range(0, ${Dim})) AS pos
       |  FROM embeddings
       |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
       |cells AS (
       |  SELECT label, pos,
       |    CAST(sum(CAST(floor(x * 1e6) AS BIGINT)) AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM expl GROUP BY 1, 2),
       |cents AS (
       |  SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
       |    list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 ORDER BY pos)
       |      AS cv
       |  FROM cells GROUP BY 1)
       |SELECT a.label AS label_a, b.label AS label_b,
       |  a.n_vecs AS n_a, b.n_vecs AS n_b,
       |  round(${VectorMath.cosineSql("a.cv", "b.cv", Dim)}, 6) + 0.0
       |    AS cos_centroid
       |FROM cents a JOIN cents b ON a.label < b.label""".stripMargin
}
