package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.SaltedAudit

/** Salted-join audit (q296): the salted rollup equals the plain-join
  * rollup computed in-Spark, and the registered shape. The DuckDB
  * plain-join twin is the oracle statement itself (graft.Verify). */
class SaltedAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("salted rollup equals the plain-join rollup") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val salted = SaltedAudit.saltedRevenueByNation(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fact = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey").isNotNull && col("l_extendedprice").isNotNull)
      .selectExpr("l_suppkey AS sk",
        "CAST(floor(l_extendedprice * 1e2) AS BIGINT) AS cents")
    val plain = fact
      .join(Tables.supplier(spark, dir)
        .selectExpr("s_suppkey AS sk", "s_nationkey"), "sk")
      .groupBy("s_nationkey")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(cents) AS BIGINT)").as("s"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("registered shape: one row per supplier nation") {
    val df = SaltedAudit.saltedRevenueByNation(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("s_nationkey", "n_rows", "cents_sum"))
    val rows = df.collect()
    // sf0.001 has ~10 suppliers, so not every nation appears
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach(r => assert(r.getLong(1) > 0L && r.getLong(2) > 0L))
  }
}
