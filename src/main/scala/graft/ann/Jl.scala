package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hyperplanes, VectorMath}

/** Johnson–Lindenstrauss random projection — the dimensionality
  * reducer in front of every large-scale vector stack (sketch the
  * 64-dim corpus to [[K]] dims, run candidate generation there, exact
  * re-rank in the original space — the q69/q145 shortlist discipline
  * applied to DIMENSIONS instead of candidates). JL: a random linear
  * map to k dims preserves pairwise distances within 1 ± ε with high
  * probability for k = O(ε⁻² log n), independent of the source
  * dimension.
  *
  * Determinism (the [[Hyperplanes]] discipline): projection rows are
  * the md5-derived hyperplane family — component (j, c) =
  * md5("j,c")[0:6] normalized to [−1, 1), uniform with variance 1/3 —
  * so y_j = dot(v, h_j) · √(3/k) makes E‖y‖² = ‖v‖² (the 1/3
  * compensates the non-unit component variance), and BOTH engines
  * regenerate the identical matrix from the same formula: the oracle
  * hash-checks the exact projection, not an approximation of it.
  *
  * Plan shape: the projection matrix is k literal arrays in the plan —
  * a pure per-row projection over one scan, zero joins, zero shuffles
  * at any scale (the posexplode to long layout is row-local). Output
  * is the long (vec_id, j, y) layout — the storage/join-friendly shape
  * downstream bucketing consumes.
  */
object Jl {

  /** Target dimensionality. */
  val K = 16

  /** √(3/K): E‖y‖² = ‖v‖² under the [−1,1)-uniform component family.
    * Driver-computed double, rendered with the shortest round-trip
    * repr so both engines parse the identical scale. */
  val Scale: Double = math.sqrt(3.0 / K)

  /** q148: project every embedding to K dims, long layout. */
  def jlProject(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ys = array((0 until K).map { j =>
      VectorMath.dot(col("v"), typedLit(Hyperplanes.plane(j, Ann.Dim))) *
        lit(Scale)
    }: _*)
    emb.select(col("vec_id"), posexplode(ys).as(Seq("j", "y0")))
      .select(col("vec_id"), col("j").cast("int").as("j"),
        (round(col("y0"), 4) + 0.0).as("y"))
  }

  /** DuckDB twin: identical plane regeneration + identical dot text. */
  val jlProjectSql: String =
    s"""WITH hp AS (${Hyperplanes.planesCteSql(K, Ann.Dim).replace("\n", " ")}),
       |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT e.vec_id, CAST(hp.j AS INT) AS j,
       |  round(${VectorMath.dotSql("e.v", "hp.h", Ann.Dim)} * $Scale, 4) + 0.0 AS y
       |FROM emb e CROSS JOIN hp""".stripMargin

  // ------------------------- q151: JL-shortlisted ANN (the consumer) --

  /** Shortlist depth for the reduced-space ranking. */
  val Rerank = 50

  /** q151: ANN via the JL path — candidate RANKING runs entirely in
    * the K-dim projected space (a K/64 per-pair cost cut with the
    * corpus represented by K doubles instead of 64 — the
    * dimensionality analogue of q69's code shortlist), then exact
    * cosine over true vectors re-ranks the [[Rerank]]-deep shortlist.
    * Projected vectors are UNROUNDED (the q54 round-trip discipline:
    * rounding is an output convention, not an internal one); the
    * projection is the identical [[jlProject]] map, so both engines
    * rank the exact same reduced-space scores. */
  def annJl(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val proj = emb.select(col("vec_id"), col("v"),
      array((0 until K).map { j =>
        VectorMath.dot(col("v"), typedLit(Hyperplanes.plane(j, Ann.Dim))) *
          lit(Scale)
      }: _*).as("pv"))
    val queries = proj.filter(col("vec_id") % Ann.QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("pv").as("qpv"))
    val wJl = Window.partitionBy(col("query_id"))
      .orderBy(col("jl_cos").desc, col("vec_id"))
    val shortlist = broadcast(queries)
      .join(proj.select(col("vec_id"), col("pv")),
        col("vec_id") =!= col("query_id"))
      .withColumn("jl_cos", VectorMath.cosineFast(col("qpv"), col("pv")))
      .withColumn("rk", row_number().over(wJl))
      .filter(col("rk") <= Rerank)
      .select(col("query_id"), col("vec_id"))
    val wFin = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(emb, "vec_id")
      .join(broadcast(emb.filter(col("vec_id") % Ann.QueryStride === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))), "query_id")
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(wFin))
      .filter(col("rk") <= Ann.TopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** DuckDB twin: identical projection (unrounded), reduced-space
    * ranking, shortlist, exact re-rank. */
  val annJlSql: String = {
    val jlCos = s"(${VectorMath.dotSql("q.qpv", "p.pv", K)}" +
      s" / (${VectorMath.normSql("q.qpv", K)} * ${VectorMath.normSql("p.pv", K)}))"
    val exactCos =
      s"(${VectorMath.dotSql("q2.v", "e.v", Ann.Dim)} / (q2.nrm * e.nrm))"
    s"""WITH hp AS (${Hyperplanes.planesCteSql(K, Ann.Dim).replace("\n", " ")}),
       |emb AS (
       |  SELECT vec_id, v, ${VectorMath.normSql("v", Ann.Dim)} AS nrm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
       |proj AS (
       |  SELECT vec_id, list(y ORDER BY j) AS pv FROM (
       |    SELECT e.vec_id, hp.j,
       |      ${VectorMath.dotSql("e.v", "hp.h", Ann.Dim)} * $Scale AS y
       |    FROM emb e CROSS JOIN hp)
       |  GROUP BY vec_id),
       |q AS (
       |  SELECT vec_id AS query_id, pv AS qpv FROM proj
       |  WHERE vec_id % ${Ann.QueryStride} = 0),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.query_id, p.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY $jlCos DESC, p.vec_id) AS rk
       |    FROM q JOIN proj p ON p.vec_id <> q.query_id)
       |  WHERE rk <= $Rerank)
       |SELECT query_id, vec_id AS neighbor_id, rk, round(cos, 4) + 0.0 AS cos FROM (
       |  SELECT sh.query_id, sh.vec_id, $exactCos AS cos,
       |    row_number() OVER (PARTITION BY sh.query_id
       |      ORDER BY $exactCos DESC, sh.vec_id) AS rk
       |  FROM short sh JOIN emb e ON e.vec_id = sh.vec_id
       |    JOIN emb q2 ON q2.vec_id = sh.query_id)
       |WHERE rk <= ${Ann.TopK}""".stripMargin
  }
}
