package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.{IncrementalAgg, IncrementalAudit}

/** Incremental audit (q297): out-of-order merge equals in-Spark full
  * recompute, batch disjointness, and the registered shape. The
  * DuckDB one-shot twin is the oracle statement (graft.Verify). */
class IncrementalAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("incremental view equals the one-shot in-Spark recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val incr = IncrementalAudit.incrementalPriorityRollup(spark, dir)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val full = IncrementalAgg.view(IncrementalAgg.partial(
      Tables.orders(spark, dir)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .selectExpr("o_orderpriority AS pr", "o_totalprice AS v"),
      "pr", "v"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(incr == full)
    assert(incr.size == 5)
  }

  test("registered shape: the view contract columns") {
    val df = IncrementalAudit.incrementalPriorityRollup(
      spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("o_orderpriority", "n", "mean", "vmin", "vmax"))
    df.collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) > 0L)
      assert(r.getDouble(r.fieldIndex("mean")) > 0.0)
    }
  }
}
