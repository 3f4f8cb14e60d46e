package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Correlation

/** Fisher-z correlation CI (q269): direct-double cross-check of the
  * atanh/tanh chain, interval sanity (lo < r < hi, shrinking with n),
  * collinearity guard, registered shape. Value-level oracle
  * equivalence runs through graft.Verify. */
class CorrCiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ci(rows: Seq[(Double, Double, Double)]) = {
    import spark.implicits._
    Correlation.corrCi(
      rows.toDF("l_quantity", "l_discount", "l_tax").repartition(4))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
  }

  test("matches a direct double-precision Fisher interval") {
    val rows = (0 until 60).map { i =>
      val q = (i % 7).toDouble
      (q, 0.6 * q + (i % 4).toDouble, (i % 5).toDouble)
    }
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      val (saa, sbb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
      (n * sab - sa * sb) /
        (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    val r = BigDecimal(corr(rows.map(_._1), rows.map(_._2)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = rows.size.toDouble
    val zr = 0.5 * math.log((1 + r) / (1 - r))
    val se = 1.0 / math.sqrt(n - 3)
    def tanh(x: Double) = (math.exp(2 * x) - 1) / (math.exp(2 * x) + 1)
    val (lo, hi) = (tanh(zr - 1.959963984540054 * se),
      tanh(zr + 1.959963984540054 * se))
    val got = ci(rows)(("quantity", "discount"))
    assert(math.abs(got.getDouble(got.fieldIndex("ci_lo")) - lo) < 1e-3)
    assert(math.abs(got.getDouble(got.fieldIndex("ci_hi")) - hi) < 1e-3)
    assert(got.getDouble(got.fieldIndex("ci_lo")) <
      got.getDouble(got.fieldIndex("pearson_r")))
    assert(got.getDouble(got.fieldIndex("pearson_r")) <
      got.getDouble(got.fieldIndex("ci_hi")))
  }

  test("exact collinearity NULLs the interval (atanh singularity)") {
    val rows = (0 until 12).map { i =>
      val q = (i % 2).toDouble
      (q, q, (i % 3).toDouble)
    }
    val got = ci(rows)(("quantity", "discount"))
    assert(got.getDouble(got.fieldIndex("pearson_r")) == 1.0)
    assert(got.isNullAt(got.fieldIndex("ci_lo")))
    assert(got.isNullAt(got.fieldIndex("ci_hi")))
  }

  test("registered shape: three pairs, intervals bracket q68's r") {
    val df = Correlation.corrCi(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("ci_lo")) <=
        r.getDouble(r.fieldIndex("pearson_r")))
      assert(r.getDouble(r.fieldIndex("pearson_r")) <=
        r.getDouble(r.fieldIndex("ci_hi")))
    }
  }
}
