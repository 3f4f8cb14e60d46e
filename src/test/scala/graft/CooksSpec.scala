package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Cooks

/** Cook's distance audit (q283): a planted outlier is found at the
  * right x, a direct double-precision cross-check of D, clean-line
  * behavior, and the registered shape. Value-level oracle equivalence
  * runs through graft.Verify. */
class CooksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def audit(pts: Seq[(Long, Double)]) = {
    import spark.implicits._
    Cooks.cooksAudit(
      pts.map { case (x, y) => (1L, x, y) }.toDF("g", "x", "y")
        .repartition(4))
      .collect().head
  }

  /** Deterministic sign wobble, mean-free over any even stretch. */
  private def s(i: Long): Double = if (i % 2 == 0) 1.0 else -1.0

  test("a planted level-shift day is the argmax and clears 4/n") {
    val pts = (0L until 50L).map { i =>
      val base = 3.0 + 0.5 * i + s(i) * 0.4
      (i, if (i == 37) base + 40.0 else base)
    }
    val r = audit(pts)
    assert(r.getLong(r.fieldIndex("argmax_x")) == 37L)
    assert(r.getDouble(r.fieldIndex("max_d")) > 4.0 / 50)
    assert(r.getLong(r.fieldIndex("n_influential")) >= 1L)
  }

  test("max D matches a direct double-precision computation") {
    val pts = (0L until 30L).map(i =>
      (i, 2.0 + 0.3 * i + s(i) * (1.0 + 0.1 * (i % 5))))
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1.toDouble).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1.toDouble * p._1).sum
    val sxy = pts.map(p => p._1.toDouble * p._2).sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = (sy - b1 * sx) / n
    val es = pts.map { case (x, y) => y - (b0 + b1 * x) }
    val sse = es.map(e => e * e).sum
    val sxxc = sxx - sx * sx / n
    val ds = pts.zip(es).map { case ((x, _), e) =>
      val h = 1.0 / n + (x - sx / n) * (x - sx / n) / sxxc
      e * e * h / (2.0 * (sse / (n - 2.0)) * (1.0 - h) * (1.0 - h))
    }
    val r = audit(pts)
    assert(math.abs(r.getDouble(r.fieldIndex("max_d")) - ds.max) < 1e-4)
    assert(r.getLong(r.fieldIndex("argmax_x")) ==
      pts(ds.indexOf(ds.max))._1)
  }

  test("leverage matters: the same residual at the edge out-influences the center") {
    // symmetric wobble plus equal-size bumps at x=0 (edge) and x=25 (center)
    val pts = (0L until 51L).map { i =>
      val base = 10.0 + s(i) * 0.5
      (i, if (i == 0 || i == 25) base + 5.0 else base)
    }
    val r = audit(pts)
    assert(r.getLong(r.fieldIndex("argmax_x")) == 0L)
  }

  test("registered shape: one row per order priority") {
    val df = Cooks.dailyRevenueCooks(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("o_orderpriority", "n_rows", "max_d", "argmax_x", "n_influential"))
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("max_d")) >= 0.0)
      assert(r.getLong(r.fieldIndex("n_influential")) >= 0L)
    }
  }
}
