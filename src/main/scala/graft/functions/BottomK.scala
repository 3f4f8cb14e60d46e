package graft.functions

import org.apache.spark.sql.Column

/** Column wrapper for the KMV bottom-k-distinct sketch aggregate
  * ([[graft.functions.expressions.KmvBottomK]]). */
object BottomK {

  /** Aggregate keeping the k smallest DISTINCT values of a BIGINT
    * hash column per group — the `row_number() OVER (ORDER BY h) <= k`
    * selection over the deduplicated hash set as a constant-state
    * map-side-combinable (and redelivery-idempotent) aggregate.
    * Returns array<bigint> ascending. */
  def kmvBottomK(hash: Column, k: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      expressions.KmvBottomK(
        org.apache.spark.sql.GraftSql.expression(hash), k)
        .toAggregateExpression())
}
