package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.FleissKappa

/** Fleiss' kappa (q205): the classic Fleiss (1971)-style 10×5 worked
  * table, perfect-agreement κ = 1, perfect-split κ = -1/(n-1)-style
  * chance floor, the completeness filter, and the one-category NULL.
  * Value-level oracle equivalence runs through graft.Verify. */
class FleissKappaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fk(rows: Seq[(String, String, String)], n: Int) = {
    import spark.implicits._
    FleissKappa.fleissKappa(rows.toDF("g", "subj", "cat").repartition(5), n)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  /** Expand an n_ij table into individual rating rows. */
  private def expand(table: Seq[Seq[Int]]): Seq[(String, String, String)] =
    table.zipWithIndex.flatMap { case (row, i) =>
      row.zipWithIndex.flatMap { case (c, j) =>
        Seq.fill(c)(("g1", s"s$i", s"cat$j"))
      }
    }

  test("the classic 14-rater 10-subject worked table") {
    // the standard Fleiss worked example (14 raters, 5 categories):
    // P-bar = 0.378, P-e = 0.213, kappa = 0.2099
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val r = fk(expand(table), 14)("g1")
    // recompute from the integer sums with the same rational chain
    val s2 = table.flatten.map(c => c * c).sum.toDouble
    val cj = table.transpose.map(_.sum)
    val nSub = table.size.toDouble
    val n = 14.0
    val pBar = (s2 - nSub * n) / (nSub * n * (n - 1.0))
    val pE = cj.map(c => c.toDouble * c).sum / (nSub * n * nSub * n)
    val kappa = (pBar - pE) / (1.0 - pE)
    assert(r.getLong(r.fieldIndex("n_subjects")) == 10L)
    assert(r.getLong(r.fieldIndex("k_categories")) == 5L)
    assert(math.abs(r.getDouble(r.fieldIndex("p_bar")) - pBar) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("p_e")) - pE) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("kappa")) - kappa) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("kappa")) - 0.2099) < 1e-3)
  }

  test("unanimous subjects across distinct categories: kappa = 1 exactly") {
    val rows = Seq("A", "B", "C").zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(3)(("g1", s"s$i", c))
    }
    val r = fk(rows, 3)("g1")
    assert(r.getDouble(r.fieldIndex("p_bar")) == 1.0)
    assert(r.getDouble(r.fieldIndex("kappa")) == 1.0)
  }

  test("every subject split 1-1: kappa = -1 exactly with 2 raters") {
    // P-bar = 0; p_A = p_B = 1/2 → P-e = 1/2 → kappa = -1
    val rows = (0 until 4).flatMap(i =>
      Seq(("g1", s"s$i", "A"), ("g1", s"s$i", "B")))
    val r = fk(rows, 2)("g1")
    assert(r.getDouble(r.fieldIndex("p_bar")) == 0.0)
    assert(r.getDouble(r.fieldIndex("kappa")) == -1.0)
  }

  test("subjects with the wrong rating count are excluded") {
    val complete = (0 until 3).flatMap(i =>
      Seq(("g1", s"s$i", "A"), ("g1", s"s$i", "B")))
    val stray = Seq(("g1", "odd", "A"), ("g1", "odd2", "A"),
      ("g1", "odd2", "A"), ("g1", "odd2", "B"))
    val r = fk(complete ++ stray, 2)("g1")
    assert(r.getLong(r.fieldIndex("n_subjects")) == 3L)
  }

  test("one category only: chance agreement 1 NULLs kappa") {
    val rows = (0 until 3).flatMap(i => Seq.fill(2)(("g1", s"s$i", "A")))
    val r = fk(rows, 2)("g1")
    assert(r.getDouble(r.fieldIndex("p_e")) == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }
}
