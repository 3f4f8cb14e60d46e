package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.BrunnerMunzel

/** Brunner–Munzel (q256): driver-reference parity (the lawstat
  * program on midranks), the stochastic-equality null, direction and
  * the p̂ effect scale, heteroscedasticity robustness vs MWU's
  * assumption, tie handling, degenerate NULLs, and the registered
  * q96-frame trio. Value-level oracle equivalence runs through
  * graft.Verify. */
class BrunnerMunzelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(xs: Seq[Long], ys: Seq[Long]) = {
    import spark.implicits._
    val cells = (xs.map((_, 0)) ++ ys.map((_, 1)))
      .groupBy(identity).map { case ((v, s), o) =>
        ("g1", s, v, o.size.toLong) }.toSeq.toDF("g", "s", "v", "c")
    BrunnerMunzel.bmTest(cells).collect().head
  }

  /** lawstat::brunner.munzel.test on driver primitives (midranks). */
  private def ref(xs: Seq[Double], ys: Seq[Double]):
      (Double, Double, Double) = {
    val all = (xs ++ ys).sorted
    def midrank(v: Double, pool: Seq[Double]): Double = {
      val below = pool.count(_ < v); val eq = pool.count(_ == v)
      below + (eq + 1) / 2.0
    }
    val rcx = xs.map(midrank(_, all)); val rcy = ys.map(midrank(_, all))
    val rwx = xs.map(midrank(_, xs)); val rwy = ys.map(midrank(_, ys))
    val (n1, n2) = (xs.size, ys.size)
    val (m1, m2) = (rcx.sum / n1, rcy.sum / n2)
    def v(rc: Seq[Double], rw: Seq[Double], m: Double, n: Int): Double = {
      val ps = rc.zip(rw).map { case (a, b) => a - b }
      val pm = ps.sum / n
      ps.map(p => (p - pm) * (p - pm)).sum / (n - 1)
    }
    val (v1, v2) = (v(rcx, rwx, m1, n1), v(rcy, rwy, m2, n2))
    val w = n1.toDouble * n2 * (m2 - m1) /
      ((n1 + n2) * math.sqrt(n1 * v1 + n2 * v2))
    val df = math.pow(n1 * v1 + n2 * v2, 2) /
      (math.pow(n1 * v1, 2) / (n1 - 1) + math.pow(n2 * v2, 2) / (n2 - 1))
    val pHat = (m2 - (n2 + 1) / 2.0) / n1
    (w, df, pHat)
  }

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("reference parity on tied heteroscedastic samples") {
    val rnd = new scala.util.Random(256)
    (1 to 4).foreach { _ =>
      val xs = Seq.fill(25)(rnd.nextInt(6).toLong + 10)
      val ys = Seq.fill(35)(rnd.nextInt(20).toLong + 5)
      val row = fit(xs, ys)
      val (w, df, p) = ref(xs.map(_.toDouble), ys.map(_.toDouble))
      assert(row.getDouble(row.fieldIndex("w_bm")) == r(w, 4))
      assert(row.getDouble(row.fieldIndex("df")) == r(df, 4))
      assert(row.getDouble(row.fieldIndex("p_hat")) == r(p, 6))
    }
  }

  test("stochastic equality: identical samples read p_hat = 0.5, W = 0") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L)
    val row = fit(xs, xs)
    assert(row.getDouble(row.fieldIndex("p_hat")) == 0.5)
    assert(row.getDouble(row.fieldIndex("w_bm")) == 0.0)
    assert(row.getDouble(row.fieldIndex("p_value")) > 0.99)
  }

  test("direction: Y stochastically above X reads p_hat > 0.5, W > 0") {
    // overlapping but shifted (FULL separation is the classical BM
    // degenerate: both placement variances 0 -> NULL, tested below)
    val row = fit(Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L),
      Seq(5L, 7L, 8L, 9L, 10L, 11L))
    assert(row.getDouble(row.fieldIndex("p_hat")) > 0.8)
    assert(row.getDouble(row.fieldIndex("w_bm")) > 3.0)
    assert(row.getDouble(row.fieldIndex("p_value")) < 0.01)
  }

  test("full separation is the classical degenerate: NULL W, p_hat = 1") {
    val row = fit(Seq(1L, 2L, 3L), Seq(7L, 8L, 9L))
    assert(row.isNullAt(row.fieldIndex("w_bm")))
    assert(row.getDouble(row.fieldIndex("p_hat")) == 1.0)
  }

  test("degenerate: both sides constant at the same value -> NULL W") {
    val row = fit(Seq(5L, 5L, 5L), Seq(5L, 5L, 5L, 5L))
    assert(row.isNullAt(row.fieldIndex("w_bm")))
    assert(row.getDouble(row.fieldIndex("p_hat")) == 0.5)
  }

  test("registered q256 at sf0.001: 5 priorities, the q96-frame trio") {
    val rows = BrunnerMunzel.orderValueBm(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val p = r.getDouble(r.fieldIndex("p_hat"))
      assert(p > 0.0 && p < 1.0)
      assert(r.getLong(r.fieldIndex("n_x")) > 10)
      assert(r.getDouble(r.fieldIndex("df")) > 1.0)
    }
  }
}
