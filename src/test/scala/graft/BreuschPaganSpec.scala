package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.BreuschPagan

/** Breusch–Pagan / Koenker (q263): planted heteroscedastic vs
  * homoscedastic series, a direct-double cross-check of the whole
  * LM chain, and the singular guards. Value-level oracle equivalence
  * runs through graft.Verify. */
class BreuschPaganSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def bp(pts: Seq[(Long, Double)]) = {
    import spark.implicits._
    BreuschPagan.bpTest(
      pts.map { case (x, y) => (1L, x, y) }.toDF("g", "x", "y")
        .repartition(4))
      .collect().head
  }

  /** Deterministic sign wobble, mean-free over any even stretch. */
  private def s(i: Long): Double = if (i % 2 == 0) 1.0 else -1.0

  test("variance growing with x: LM large, p below 0.05") {
    // e_i amplitude ∝ x → u = e² tracks x → auxiliary R² near 1
    val pts = (0L until 100L).map(i => (i, 2.0 * i + s(i) * (0.2 * i)))
    val r = bp(pts)
    assert(r.getDouble(r.fieldIndex("lm_stat")) > 3.8415) // χ²₁ 5% crit
    assert(r.getDouble(r.fieldIndex("p_bp")) < 0.05)
  }

  test("constant-amplitude wobble: LM small, p above 0.05") {
    val pts = (0L until 100L).map(i => (i, 2.0 * i + s(i) * 3.0))
    val r = bp(pts)
    assert(r.getDouble(r.fieldIndex("lm_stat")) < 3.8415)
    assert(r.getDouble(r.fieldIndex("p_bp")) > 0.05)
  }

  test("LM and p match a direct double-precision Koenker computation") {
    // amplitude has a genuine (but partial) trend in x, so LM sits in
    // the interesting middle of its range rather than a saturated tail
    val pts = (0L until 60L).map { i =>
      (i, 5.0 + 0.5 * i + s(i) * (1.0 + 0.05 * i) +
        (if (i % 3 == 0) 0.7 else -0.35))
    }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1.toDouble).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1.toDouble * p._1).sum
    val sxy = pts.map(p => p._1.toDouble * p._2).sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = (sy - b1 * sx) / n
    val u = pts.map { case (x, y) => val e = y - (b0 + b1 * x); e * e }
    val (su, suu) = (u.sum, u.map(v => v * v).sum)
    val sux = pts.map(_._1.toDouble).zip(u).map { case (x, v) => x * v }.sum
    val num = n * sux - su * sx
    val lm = n * num * num / ((n * sxx - sx * sx) * (n * suu - su * su))
    val r = bp(pts)
    assert(math.abs(r.getDouble(r.fieldIndex("lm_stat")) - lm) < 1e-2)
    // p from the same A&S 7.1.26 chain on z = √LM
    val z = BigDecimal(math.sqrt(lm)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val xx = math.abs(z) / 1.4142135623730951
    val t = 1.0 / (1.0 + 0.3275911 * xx)
    val p = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-xx * xx)
    assert(math.abs(r.getDouble(r.fieldIndex("p_bp")) - p) < 1e-3)
  }

  test("exact linear fit: zero residual variance makes LM NULL") {
    val r = bp(Seq((0L, 1.0), (1L, 3.0), (2L, 5.0), (3L, 7.0)))
    assert(r.isNullAt(r.fieldIndex("lm_stat")))
    assert(r.isNullAt(r.fieldIndex("p_bp")))
  }

  test("constant x is singular: b1 and LM are NULL") {
    val r = bp(Seq((2L, 1.0), (2L, 3.0), (2L, 5.0), (2L, 7.0)))
    assert(r.isNullAt(r.fieldIndex("b1")))
    assert(r.isNullAt(r.fieldIndex("lm_stat")))
  }

  test("registered shape: one row per order priority") {
    val df = BreuschPagan.dailyRevenueBp(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 5)
    assert(df.columns.toSeq ==
      Seq("o_orderpriority", "n_rows", "b1", "lm_stat", "p_bp"))
  }
}
