package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Levene

/** Brown–Forsythe spread test (q182): hand-computed W from exact
  * sufficient statistics, equal-spread zero, outlier robustness of the
  * median center, and degenerate NULLs. Value-level oracle equivalence
  * runs through graft.Verify. */
class LeveneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def bf(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Levene.brownForsythe(rows.toDF("g", "x2").repartition(3)).collect().head
  }

  test("hand case: A={2,4,6}, B={0,20,40} → W = 215.33/67.5 = 3.1901") {
    val r = bf(Seq(("A", 2L), ("A", 4L), ("A", 6L),
      ("B", 0L), ("B", 20L), ("B", 40L)))
    assert(r.getLong(r.fieldIndex("k_groups")) == 2L)
    assert(r.getLong(r.fieldIndex("n_rows")) == 6L)
    assert(r.getLong(r.fieldIndex("df2")) == 4L)
    assert(r.getDouble(r.fieldIndex("w_stat")) == 3.1901)
  }

  test("identical spreads around different centers: W = 0") {
    // same |x − med| multiset in both groups
    val r = bf(Seq(("A", 0L), ("A", 10L), ("A", 20L),
      ("B", 100L), ("B", 110L), ("B", 120L)))
    assert(r.getDouble(r.fieldIndex("w_stat")) == 0.0)
    assert(r.getDouble(r.fieldIndex("p_value")) > 0.9)
  }

  test("median center resists one wild outlier in an otherwise tight group") {
    // classical Levene (mean center) would inflate EVERY deviation in A;
    // the median keeps the tight core's z's small except the outlier's own
    val tight = Seq.tabulate(9)(i => ("A", 100L + 2 * i))
    val wide = Seq.tabulate(9)(i => ("B", 100L + 40 * i))
    val base = bf(tight ++ wide)
    val poisoned = bf((tight :+ ("A", 100000L)) ++ wide)
    val (w0, w1) = (base.getDouble(base.fieldIndex("w_stat")),
      poisoned.getDouble(poisoned.fieldIndex("w_stat")))
    assert(w0 > 2.0, s"w0=$w0") // spreads genuinely differ
    assert(w1 > 0.5, s"w1=$w1") // signal survives the outlier
  }

  test("all values constant: SSW = 0 → NULL") {
    val r = bf(Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)))
    assert(r.isNullAt(r.fieldIndex("w_stat")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("one group: k < 2 → NULL") {
    val r = bf(Seq(("A", 1L), ("A", 2L), ("A", 3L)))
    assert(r.isNullAt(r.fieldIndex("w_stat")))
  }
}
