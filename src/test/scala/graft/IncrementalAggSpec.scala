package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.IncrementalAgg

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.view(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  test("incremental fold over batches equals full recompute exactly") {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("s"), col("o_totalprice").as("x"))
    val full = IncrementalAgg.partial(orders, "s", "x")
    // three deterministic disjoint batches, folded in scrambled order
    val b = (0 until 3).map(i =>
      IncrementalAgg.partial(orders.filter(pmod(crc32(col("x").cast("string")), lit(3)) === i), "s", "x"))
    val inc1 = IncrementalAgg.merge(IncrementalAgg.merge(b(2), b(0)), b(1))
    val inc2 = IncrementalAgg.merge(b(0), IncrementalAgg.merge(b(1), b(2)))
    assert(canon(inc1) == canon(full))
    assert(canon(inc2) == canon(full)) // associativity / order independence
  }

  test("empty delta is the identity; new keys appear only via their batch") {
    import spark.implicits._
    val s0 = IncrementalAgg.partial(
      Seq(("a", 1.0), ("a", 3.0)).toDF("k", "x"), "k", "x")
    val empty = IncrementalAgg.partial(
      Seq.empty[(String, Double)].toDF("k", "x"), "k", "x")
    assert(canon(IncrementalAgg.merge(s0, empty)) == canon(s0))
    val s1 = IncrementalAgg.merge(s0, IncrementalAgg.partial(
      Seq(("b", 5.0)).toDF("k", "x"), "k", "x"))
    val got = canon(s1)
    assert(got == Set(("a", 2L, 2.0, 1.0, 3.0), ("b", 1L, 5.0, 5.0, 5.0)))
  }
}
