package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Correlation

/** VIF (q267): orthogonal-design floor, exact-collinearity NULLs, a
  * direct-double cross-check of the closed-form 3-variable R², and
  * the registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class VifSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fact(rows: Seq[(Double, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("l_quantity", "l_discount", "l_tax").repartition(4)
  }

  test("mutually orthogonal regressors: every VIF is exactly 1") {
    // three ±1 patterns over 8 rows, pairwise orthogonal and mean-free
    val rows = (0 until 8).map { i =>
      (if ((i & 1) == 0) 1.0 else -1.0,
        if ((i & 2) == 0) 1.0 else -1.0,
        if ((i & 4) == 0) 1.0 else -1.0)
    }
    val got = Correlation.vif(fact(rows)).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("vif"))).toMap
    assert(got == Map("quantity" -> 1.0, "discount" -> 1.0, "tax" -> 1.0))
  }

  test("exact collinearity: VIF blows up or NULLs, never a sane-looking lie") {
    // q ∈ {0,1} makes the centered Cauchy–Schwarz bound a perfect
    // square (X = 4e8, √X = 2e4 exact), so r_qd = 1.0 EXACTLY and the
    // third variable's control hits the nullif deterministically; the
    // collinear pair's own VIF is ∞ up to fp — NULL or enormous, and
    // the r2 ≥ 0 guard forbids the negative-denominator artifact
    val rows = (0 until 12).map { i =>
      val q = (i % 2).toDouble
      (q, q, (i % 3).toDouble) // discount ≡ quantity
    }
    val byVar = Correlation.vif(fact(rows)).collect()
      .map(r => r.getString(0) -> r).toMap
    def blown(v: String): Boolean = {
      val r = byVar(v)
      r.isNullAt(r.fieldIndex("vif")) || r.getDouble(r.fieldIndex("vif")) > 100.0
    }
    assert(blown("quantity") && blown("discount"))
    val t = byVar("tax")
    assert(t.isNullAt(t.fieldIndex("vif"))) // r_bc = 1.0 exact → nullif
  }

  test("matches a direct double-precision normal-equations R²") {
    val rows = (0 until 40).map { i =>
      val q = (i % 7).toDouble
      val d = 0.5 * q + (i % 3).toDouble // correlated with q
      val t = (i % 4).toDouble
      (q, d, t)
    }
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      val (saa, sbb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
      (n * sab - sa * sb) /
        (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    val (qs, ds, ts) =
      (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val (rqd, rqt, rdt) = (corr(qs, ds), corr(qs, ts), corr(ds, ts))
    val r2q = (rqd * rqd + rqt * rqt - 2 * rqd * rqt * rdt) / (1 - rdt * rdt)
    val vifQ = 1.0 / (1.0 - r2q)
    val got = Correlation.vif(fact(rows)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(got("quantity")
      .getDouble(got("quantity").fieldIndex("vif")) - vifQ) < 1e-3)
  }

  test("registered shape: three variables on lineitem") {
    val df = Correlation.vif(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(df.columns.toSeq == Seq("variable", "n_rows", "r2_others", "vif"))
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("vif")) >= 1.0))
  }
}
