package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.QuantileTransform

/** CDF-transform invariants. Value-level oracle equivalence runs
  * through graft.Verify. */
class QuantileTransformSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("midrank CDF: plateau convention, monotone, ends anchored") {
    import spark.implicits._
    // values: 1 x4, 2 x2, 5 x2 (n=8): midranks 2.5, 5.5, 7.5 of 8
    val df = (Seq.fill(4)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(5L)).toDF("v")
    val got = QuantileTransform.cdfTable(df, "v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((4L, 250000L)))  // (0+4)/2 / 8 = 0.25
    assert(got(2L) == ((2L, 625000L)))  // (8+2)/2 / 8
    assert(got(5L) == ((2L, 875000L)))  // (12+2)/2 / 8
  }

  test("q93 over testdata: counts conserve, cdf strictly increases with value") {
    val dir = "/root/testdata/sf0.001"
    val t = QuantileTransform.quantityCdf(spark, dir).cache()
    assert(t.agg(sum("n_rows")).head.getLong(0) ==
      Tables.lineitem(spark, dir).count())
    val rows = t.orderBy("value").collect().map(r => (r.getLong(0), r.getLong(2)))
    rows.sliding(2).foreach { case Array((v1, c1), (v2, c2)) =>
      assert(v1 < v2 && c1 < c2, s"cdf must strictly increase: $v1->$c1, $v2->$c2")
    }
    assert(rows.last._2 <= 1000000L && rows.head._2 > 0L)
  }
}
