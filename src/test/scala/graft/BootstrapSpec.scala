package graft

import org.scalatest.funsuite.AnyFunSuite

import operators.Bootstrap

class BootstrapSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  /** Driver mirror of the weight rule: first 12 md5 hex chars of
    * "k#b" vs the Poisson thresholds. */
  private def weight(k: Long, b: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$k#$b".getBytes("UTF-8")).map(x => f"$x%02x").mkString
    val u = java.lang.Long.parseLong(h.take(12), 16)
    Bootstrap.Thresholds.count(u >= _)
  }

  test("thresholds encode Poisson(1): e^-1 zero-mass, mean ≈ 1") {
    val n = 20000
    val ws = (0 until n).map(i => weight(i.toLong, i % 50))
    val zeroFrac = ws.count(_ == 0).toDouble / n
    assert(math.abs(zeroFrac - math.exp(-1.0)) < 0.02)
    assert(math.abs(ws.sum.toDouble / n - 1.0) < 0.02)
  }

  test("deterministic: two evaluations produce identical CIs") {
    def once() = Bootstrap.segmentBalanceCi(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(once() == once())
  }

  test("constant data: the CI collapses onto the exact mean") {
    val df = (1L to 300L).map(k => ("g", k, 12345L)).toDF("seg", "k", "xc")
    val out = Bootstrap.bootstrapCi(df, "seg", "k", "xc").collect().head
    assert(out.getDouble(3) == 123.45)
    assert(out.getDouble(4) == 123.45 && out.getDouble(5) == 123.45)
  }

  test("resample means + CI bounds equal the driver brute force") {
    val rows = (1L to 120L).map(k => ("g", k, 100L + (k * k) % 700))
    val out = Bootstrap.bootstrapCi(rows.toDF("seg", "k", "xc"),
      "seg", "k", "xc", b = 80).collect().head
    val means = (0 until 80).flatMap { b =>
      val ws = rows.map { case (_, k, xc) => (weight(k, b), xc) }
      val sw = ws.map(_._1.toLong).sum
      if (sw == 0) None
      else Some(ws.map { case (w, xc) => w.toLong * xc }.sum.toDouble / sw)
    }.sorted
    val bn = means.size
    val lo = means((25 * bn + 999) / 1000 - 1)
    val hi = means((975 * bn + 999) / 1000 - 1)
    assert(out.getLong(2) == bn.toLong)
    // output is round(·/100, 4): brute agrees within the rounding ulp
    assert(math.abs(out.getDouble(4) - lo / 100) < 6e-5,
      s"ci_lo ${out.getDouble(4)} vs brute ${lo / 100}")
    assert(math.abs(out.getDouble(5) - hi / 100) < 6e-5,
      s"ci_hi ${out.getDouble(5)} vs brute ${hi / 100}")
  }

  test("real data: CI brackets the point mean, bounds ordered") {
    val rows = Bootstrap.segmentBalanceCi(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= hi)
      assert(lo <= m && m <= hi,
        s"${r.getString(0)}: CI [$lo, $hi] must bracket mean $m")
    }
  }
}
