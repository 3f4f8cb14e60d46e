package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic random-hyperplane family for sign-LSH over embeddings.
  *
  * Component (plane j, coord c) = md5("j,c")[0:6] as a 24-bit int,
  * normalized to [-1, 1). Computed driver-side with MessageDigest (bit-
  * identical to SQL `md5`), embedded in the plan as literal arrays — so
  * the Spark plan needs NO join to hash a vector into its bucket, and a
  * DuckDB oracle can regenerate the identical planes from the same
  * formula ([[componentSql]]).
  *
  * Sign-LSH: bucket(v) = concat_j [dot(v, h_j) > 0]. Vectors in the same
  * bucket are angularly close with probability growing in cos(v, w) —
  * candidate generation is a hash-partition on an 8-char key, never a
  * cross join.
  */
object Hyperplanes {

  def component(plane: Int, coord: Int): Double =
    java.lang.Long.parseLong(Hashing.md5hex(s"$plane,$coord").substring(0, 6), 16) / 8388607.5 - 1.0

  /** Plane j as a dim-length array. */
  def plane(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(c => component(j, c))

  /** Bucket-signature column: '0'/'1' per plane, concatenated in plane
    * order. `vec` must be array<double>. `planeOffset` selects an
    * independent hash-family member (multi-table LSH uses offset
    * t·nPlanes for table t). */
  def bucket(vec: Column, nPlanes: Int, dim: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until nPlanes).map { j =>
      when(VectorMath.dot(vec, typedLit(plane(planeOffset + j, dim))) > 0.0, lit("1"))
        .otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** DuckDB twin of [[component]] for plane var `j`, coord var `c`. */
  def componentSql(j: String, c: String): String =
    s"${Hashing.hash24Sql(s"($j)::VARCHAR || ',' || ($c)::VARCHAR")} / 8388607.5 - 1.0"

  /** DuckDB CTE body yielding (j, h DOUBLE[]) for planes 0..n-1. */
  def planesCteSql(nPlanes: Int, dim: Int): String =
    s"""SELECT j, list_transform(range(0, $dim), c -> ${componentSql("j", "c")}) AS h
       |FROM range(0, $nPlanes) t(j)""".stripMargin
}
