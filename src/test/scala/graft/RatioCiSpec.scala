package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.RatioCi

/** Ratio-metric delta CI (q285): a direct double-precision
  * cross-check, the cluster-correlation effect the naive SE misses,
  * guards, and the registered shape. Value-level oracle equivalence
  * runs through graft.Verify. */
class RatioCiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ci(clusters: Seq[(Long, Long)], scale: Double = 1.0) = {
    import spark.implicits._
    RatioCi.ratioCi(
      clusters.map { case (y, x) => ("g", y, x) }.toDF("g", "y", "x")
        .repartition(4), scale)
      .collect().head
  }

  /** Direct delta-method computation over cluster pairs. */
  private def direct(cl: Seq[(Long, Long)]): (Double, Double) = {
    val n = cl.size.toDouble
    val (sy, sx) = (cl.map(_._1).sum.toDouble, cl.map(_._2).sum.toDouble)
    val r = sy / sx
    val (my, mx) = (sy / n, sx / n)
    val vy = cl.map(c => (c._1 - my) * (c._1 - my)).sum / (n - 1)
    val vx = cl.map(c => (c._2 - mx) * (c._2 - mx)).sum / (n - 1)
    val cxy = cl.map(c => (c._1 - my) * (c._2 - mx)).sum / (n - 1)
    (r, math.sqrt((vy - 2 * r * cxy + r * r * vx) / (n * mx * mx)))
  }

  test("ratio and SE match the direct delta-method computation") {
    val cl = Seq((100L, 2L), (350L, 5L), (80L, 1L), (240L, 4L),
      (130L, 2L), (400L, 7L), (90L, 1L), (310L, 6L))
    val (r0, se0) = direct(cl)
    val r = ci(cl)
    assert(math.abs(r.getDouble(r.fieldIndex("ratio")) - r0) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("se")) - se0) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("ci_lo")) - (r0 - 1.96 * se0)) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("ci_hi")) - (r0 + 1.96 * se0)) < 1e-3)
  }

  test("constant per-cluster ratio: SE exactly 0") {
    // every cluster has y = 50·x → R = 50, zero linearized variance
    val cl = Seq((100L, 2L), (250L, 5L), (50L, 1L), (200L, 4L))
    val r = ci(cl)
    assert(r.getDouble(r.fieldIndex("ratio")) == 50.0)
    assert(r.getDouble(r.fieldIndex("se")) == 0.0)
  }

  test("cluster weighting: R is the ratio of sums, not the mean of ratios") {
    // one heavy cluster (1000/10 = 100) vs nine light (10/1 = 10):
    // ratio of sums = 1090/19 ≈ 57.4, mean of ratios would be 19
    val cl = (1 to 9).map(_ => (10L, 1L)) :+ ((1000L, 10L))
    val r = ci(cl)
    assert(math.abs(r.getDouble(r.fieldIndex("ratio")) - 1090.0 / 19) < 1e-3)
  }

  test("single cluster: inference NULL") {
    val r = ci(Seq((100L, 2L)))
    assert(r.isNullAt(r.fieldIndex("ratio")))
    assert(r.isNullAt(r.fieldIndex("se")))
  }

  test("scale divides the display: cents in, dollars out") {
    val cl = Seq((100L, 2L), (350L, 5L), (80L, 1L), (240L, 4L))
    val raw = ci(cl).getDouble(2)
    val scaled = ci(cl, 100.0).getDouble(2)
    assert(math.abs(scaled - raw / 100.0) < 1e-3)
  }

  test("registered shape: one row per market segment") {
    val df = RatioCi.segmentRevenuePerOrder(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("c_mktsegment", "n_units", "ratio", "se", "ci_lo", "ci_hi"))
    assert(rows.length == 5)
    rows.foreach { r =>
      val (lo, hi) = (r.getDouble(r.fieldIndex("ci_lo")),
        r.getDouble(r.fieldIndex("ci_hi")))
      assert(lo <= r.getDouble(r.fieldIndex("ratio")) &&
        r.getDouble(r.fieldIndex("ratio")) <= hi)
    }
  }
}
