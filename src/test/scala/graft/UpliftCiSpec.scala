package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.UpliftCi

/** Bootstrap uplift CI (q257): driver brute-force parity (the weights
  * are deterministic, so the whole resampling distribution is
  * recomputable), null-effect coverage, a planted shift bracketed,
  * zero-mass-arm resample accounting, and the registered four-lens
  * frame. Value-level oracle equivalence runs through graft.Verify. */
class UpliftCiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(xs: Seq[(Int, Long, Long)], b: Int = 200) = {
    import spark.implicits._
    UpliftCi.upliftCi(
      xs.map { case (s, k, x) => ("g1", s, k, x) }.toDF("g", "s", "k", "xc"),
      b).collect().head
  }

  /** Driver twin: same weights, same diffs, same elections. */
  private def ref(xs: Seq[(Int, Long, Long)], b: Int = 200):
      (Double, Double, Long) = {
    val diffs = (0 until b).flatMap { bi =>
      var (sw0, sw1) = (0L, 0L); var (sx0, sx1) = (BigInt(0), BigInt(0))
      xs.foreach { case (s, k, x) =>
        // the q144 thresholds against the hash48Seq member spelling
        val u = java.lang.Long.parseLong(functions.Hashing
          .md5hex(s"${operators.UpliftCi.Seed}:$bi:$k").substring(0, 12), 16)
        val w = operators.Bootstrap.Thresholds.count(u >= _)
        if (s == 0) { sw0 += w; sx0 += BigInt(w) * x }
        else { sw1 += w; sx1 += BigInt(w) * x }
      }
      if (sw0 > 0 && sw1 > 0)
        Some(sx1.toDouble / sw1 - sx0.toDouble / sw0)
      else None
    }
    val sorted = diffs.sorted
    val bn = sorted.length
    val lo = sorted(((25 * bn + 999) / 1000) - 1)
    val hi = sorted(((975 * bn + 999) / 1000) - 1)
    def r4(x: Double) = BigDecimal(x / 100)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r4(lo), r4(hi), bn.toLong)
  }

  test("driver brute-force parity of both bounds and the count") {
    val rnd = new scala.util.Random(257)
    val xs = (1L to 60L).map(k =>
      ((k % 2).toInt, k, 1000L + rnd.nextInt(500)))
    val row = fit(xs)
    val (lo, hi, bn) = ref(xs)
    assert(row.getLong(row.fieldIndex("n_resamples")) == bn)
    assert(row.getDouble(row.fieldIndex("ci_lo")) == lo)
    assert(row.getDouble(row.fieldIndex("ci_hi")) == hi)
  }

  test("null effect: identical arms bracket zero") {
    val xs = (1L to 80L).map(k => ((k % 2).toInt, k, 2000L + (k / 2) % 40))
    val row = fit(xs)
    assert(row.getDouble(row.fieldIndex("ci_lo")) < 0.0)
    assert(row.getDouble(row.fieldIndex("ci_hi")) > 0.0)
  }

  test("a planted +50-dollar uplift is bracketed, away from zero") {
    val rnd = new scala.util.Random(7)
    val xs = (1L to 200L).map { k =>
      val s = (k % 2).toInt
      (s, k, 10000L + rnd.nextInt(2000) + (if (s == 1) 5000L else 0L))
    }
    val row = fit(xs)
    val (lo, hi) = (row.getDouble(row.fieldIndex("ci_lo")),
      row.getDouble(row.fieldIndex("ci_hi")))
    // the CI resamples the SAMPLE: it must be near the planted $50
    // (within sampling noise of the uniform covariate) and exclude 0
    assert(lo > 40.0 && hi < 65.0, s"CI [$lo, $hi]")
    val d = row.getDouble(row.fieldIndex("diff_mean"))
    assert(d > lo && d < hi)
  }

  test("tiny arms: zero-mass resamples drop and are visible in the count") {
    // n=2 per arm: P(arm mass 0 per resample) = e^-2 ≈ 0.135 — the
    // count must fall measurably below B
    val xs = Seq((0, 1L, 100L), (0, 2L, 200L), (1, 3L, 150L), (1, 4L, 250L))
    val row = fit(xs)
    val bn = row.getLong(row.fieldIndex("n_resamples"))
    assert(bn < 200L && bn > 100L, s"n_resamples $bn")
  }

  test("registered q257 at sf0.001: 5 priorities, interval sane") {
    val rows = UpliftCi.orderValueUplift(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (lo, hi) = (r.getDouble(r.fieldIndex("ci_lo")),
        r.getDouble(r.fieldIndex("ci_hi")))
      val d = r.getDouble(r.fieldIndex("diff_mean"))
      assert(lo < hi && d > lo - 1e-9 && d < hi + 1e-9,
        s"${r.getString(0)}: [$lo, $hi] d=$d")
    }
  }
}
