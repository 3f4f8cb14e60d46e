package graft.functions

import org.apache.spark.sql.Column

/** Column wrapper for the pointwise-max array aggregate
  * ([[graft.functions.expressions.ArrayMaxAgg]]). */
object ArrayMax {

  /** Elementwise max of length-m int arrays per group — the HLL
    * register merge as a constant-state map-side-combinable (and
    * redelivery-idempotent) aggregate; the packed register layout for
    * per-node sketch frames (HyperBall). */
  def arrayMax(arr: Column, m: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      expressions.ArrayMaxAgg(
        org.apache.spark.sql.GraftSql.expression(arr), m)
        .toAggregateExpression())
}
