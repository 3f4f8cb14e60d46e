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
}
