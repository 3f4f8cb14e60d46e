package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.DdSketch

class DdSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  private val dir = "/root/testdata/sf0.01"

  private def rowsDf(vals: Seq[(String, Double, Long)]) = {
    import spark.implicits._
    vals.toDF("g", "x", "k")
  }

  test("hand case: power-of-two boundary values pin the snap behavior") {
    // x = 2: the 1e-9 ln-snap rounds ln 2 UP (0.6931471805… →
    // 0.693147181), so snap·IdxMul = 16.0000000103 and ceil lands the
    // boundary value at the NEXT bucket's lower edge — i = 17, not 16.
    // Deterministic and engine-identical (the whole point of the
    // snap); the estimate 2^(33/32) is exactly 2^(1/32) above the true
    // value, i.e. AT the guarantee band's edge, inside it inclusively.
    val sk = DdSketch.sketch(rowsDf(Seq(("a", 2.0, 1L), ("a", 1024.0, 2L))))
      .orderBy("i").collect()
    assert(sk.map(_.getLong(1)).toSeq == Seq(17L, 161L))
    val got = DdSketch.sketch(rowsDf(Seq(("a", 2.0, 1L), ("a", 1024.0, 2L))))
      .select(DdSketch.estimateOf(col("i")).as("e"))
      .orderBy("e").collect().map(_.getDouble(0))
    assert(math.abs(got(0) - math.pow(2.0, 33.0 / 32.0)) < 1e-12)
    assert(math.abs(got(1) - math.pow(2.0, 321.0 / 32.0)) < 1e-9)
    assert(got(0) / 2.0 <= math.pow(2.0, 1.0 / 32.0) + 1e-12)
  }

  test("relative-error guarantee holds on real data: |rel_err| ≤ 2^(1/32) − 1") {
    val bound = math.pow(2.0, 1.0 / 32.0) - 1 // ≈ 0.0219
    val bad = DdSketch.orderPriceDdSketch(spark, dir)
      .filter(abs(col("rel_err")) > bound).collect()
    assert(bad.isEmpty, s"estimates outside the α band: ${bad.mkString(";")}")
  }

  test("merge of split sketches ≡ the whole-corpus sketch, frame-exact") {
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x"),
        col("o_orderkey").as("k"))
    val whole = DdSketch.sketch(rows)
    val m = DdSketch.merged(
      DdSketch.sketch(rows.filter(col("k") % 2 === 0)),
      DdSketch.sketch(rows.filter(col("k") % 2 =!= 0)))
    assert(m.join(whole, Seq("g", "i", "cnt"), "full_outer")
      .filter(col("cnt").isNull).count() == 0)
    assert(m.exceptAll(whole).count() == 0 && whole.exceptAll(m).count() == 0)
  }

  test("sketch is dimension-grade: buckets per group bounded by the log range") {
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x"))
    val perGroup = DdSketch.sketch(rows.withColumn("k", lit(0L)))
      .groupBy("g").count().collect().map(_.getLong(1))
    val range = rows.agg(max(col("x")), min(col("x"))).head
    val maxBuckets =
      DdSketch.SubBuckets * (math.log(range.getDouble(0) / range.getDouble(1))
        / math.log(2.0)) + 2
    assert(perGroup.forall(_ <= maxBuckets),
      s"per-group buckets ${perGroup.max} exceed the log-range bound $maxBuckets")
  }

  test("values in [1, 2^(1/16)) fold into bucket 1 (domain guard)") {
    val sk = DdSketch.sketch(rowsDf(Seq(("a", 1.0, 1L), ("a", 1.02, 2L))))
      .collect()
    assert(sk.length == 1 && sk(0).getLong(1) == 1L && sk(0).getLong(2) == 2L)
  }
}
