package graft.functions

import org.apache.spark.sql.Column

/** Column wrapper for the bounded top-k election aggregate
  * ([[graft.functions.expressions.BoundedTopK]]). */
object TopK {

  /** Aggregate electing the k ids with highest (score, then smallest
    * id) per group — the `row_number() <= k` selection as a
    * constant-state map-side-combinable aggregate. Returns
    * array<bigint> in rank order; pair with `posexplode` to recover
    * (rank−1, id) rows. */
  def topkIds(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      expressions.BoundedTopK(
        org.apache.spark.sql.GraftSql.expression(score),
        org.apache.spark.sql.GraftSql.expression(id), k)
        .toAggregateExpression())
}
