package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Mahalanobis

/** Mahalanobis audit (q284): the joint-outlier case neither marginal
  * test sees, a direct double-precision cross-check, the singular
  * guard, and the registered shape. Value-level oracle equivalence
  * runs through graft.Verify. */
class MahalanobisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def audit(pts: Seq[(Double, Double)]) = {
    import spark.implicits._
    Mahalanobis.mahalanobisAudit(
      pts.map { case (a, b) => ("g", a, b) }.toDF("g", "x1", "x2")
        .repartition(4))
      .collect().head
  }

  /** Correlated base cloud on a deterministic grid: x2 ≈ 2·x1 + wobble. */
  private def cloud(n: Int): Seq[(Double, Double)] =
    (0 until n).map { i =>
      val x = (i % 20).toDouble
      (x, 2.0 * x + (if (i % 2 == 0) 1.0 else -1.0) * (1.0 + (i % 3)))
    }

  test("a joint outlier with ordinary marginals is flagged") {
    // (10, 45): x1 = 10 is the exact mean, x2 = 45 is inside the x2
    // range — but the PAIR is far off the x2 ≈ 2·x1 ridge
    val pts = cloud(200) :+ ((10.0, 45.0))
    val r = audit(pts)
    assert(r.getLong(r.fieldIndex("n_out99")) >= 1L)
    assert(r.getDouble(r.fieldIndex("max_d2")) > 9.2103)
  }

  test("max d² matches a direct double-precision computation") {
    val pts = cloud(60)
    val n = pts.size.toDouble
    val (m1, m2) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val c11 = pts.map(p => (p._1 - m1) * (p._1 - m1)).sum / n
    val c22 = pts.map(p => (p._2 - m2) * (p._2 - m2)).sum / n
    val c12 = pts.map(p => (p._1 - m1) * (p._2 - m2)).sum / n
    val det = c11 * c22 - c12 * c12
    val d2 = pts.map { case (x1, x2) =>
      val (a, b) = (x1 - m1, x2 - m2)
      (a * a * c22 - 2 * a * b * c12 + b * b * c11) / det
    }
    val r = audit(pts)
    assert(math.abs(r.getDouble(r.fieldIndex("max_d2")) - d2.max) < 1e-3)
  }

  test("clean elliptical cloud: no 1% outliers at modest n") {
    val r = audit(cloud(100))
    assert(r.getLong(r.fieldIndex("n_out99")) == 0L)
    assert(r.getLong(r.fieldIndex("out_ppm")) == 0L)
  }

  test("collinear columns: singular covariance yields NULL distances") {
    val pts = (0 until 50).map(i => (i.toDouble, 2.0 * i))
    val r = audit(pts)
    assert(r.isNullAt(r.fieldIndex("max_d2")))
  }

  test("registered shape: one row per return flag") {
    val df = Mahalanobis.lineitemMahalanobis(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "n_rows", "max_d2", "n_out99", "out_ppm"))
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getLong(r.fieldIndex("n_rows")) > 0L))
  }
}
