package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns using only Catalyst
  * higher-order functions (`zip_with`, `aggregate`, `transform`) — no
  * UDFs, so everything stays inside whole-stage codegen and is portable
  * to a SQL oracle.
  *
  * Summation is a strict left fold in element order on BOTH engines
  * (Spark `aggregate` ↔ DuckDB `list_reduce`), so doubles come out
  * bitwise-identical and oracle hash-compares are stable without
  * tolerance windows.
  */
object VectorMath {

  /** Left-fold sum of an array<double> column. */
  def vsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns (element order fold).
    * Runs as the fused native
    * [[graft.functions.expressions.DotProduct]] — bitwise-identical to
    * [[dotComposable]] (same strict left fold) but one register-level
    * pass with no intermediate array: the zip_with/aggregate chain is
    * CodegenFallback, and the literal-row projections built on this
    * (OPQ rotation, PQ lookup tables, JL, hyperplanes) evaluate it up
    * to 128× per row. Parity is pinned by DotProductSpec. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      expressions.DotProduct(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** The composable HOF form [[dot]] fuses — kept for parity specs. */
  private[graft] def dotComposable(a: Column, b: Column): Column =
    vsum(zip_with(a, b, (x, y) => x * y))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fully composable cosine — the reference form CosineSimilaritySpec
    * compares the fused expressions against, so it must stay on the
    * HOF chain (not on the fused [[dot]]). */
  def cosine(a: Column, b: Column): Column =
    dotComposable(a, b) /
      (sqrt(dotComposable(a, a)) * sqrt(dotComposable(b, b)))

  /** Fused single-pass cosine via the native
    * [[graft.functions.expressions.CosineSimilarity]] expression —
    * bitwise-identical to [[cosine]] (same per-accumulator fold order)
    * but no intermediate arrays and one vector pass. Requires a session
    * built by [[graft.Engine]] (which injects the function). */
  def cosineFast(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  // ---- DuckDB twins (same fold order via list_reduce) ----

  /** DuckDB: dot product of two DOUBLE[] expressions, left fold. */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]), (acc, x) -> acc + x)"

  def normSql(a: String, dim: Int): String =
    s"sqrt(${dotSql(a, a, dim)})"

  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (${normSql(a, dim)} * ${normSql(b, dim)}))"
}
