package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.MoodMedian

/** Mood's median test (q204): separated-classes hand case (chi2 = 10
  * exactly), identical-classes zero, the lower-median tie convention,
  * and the degenerate one-sided contract. Value-level oracle
  * equivalence runs through graft.Verify. */
class MoodMedianSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def mood(vals: Seq[(String, Long)]) = {
    import spark.implicits._
    MoodMedian.moodTest(vals.toDF("cls", "v").repartition(5)).collect().head
  }

  test("fully separated classes: chi2 = 10 exactly") {
    // X = 1..5 all at-or-below the pooled median 5, Y = 6..10 all
    // above: each class term = 2.5 + 2.5
    val r = mood((1 to 5).map(i => ("X", i.toLong)) ++
      (6 to 10).map(i => ("Y", i.toLong)))
    assert(r.getLong(r.fieldIndex("n_rows")) == 10L)
    assert(r.getLong(r.fieldIndex("median_v")) == 5L)
    assert(r.getDouble(r.fieldIndex("chi2")) == 10.0)
    assert(r.getLong(r.fieldIndex("dof")) == 1L)
  }

  test("identical classes: chi2 = 0 exactly") {
    val r = mood(Seq("X", "Y").flatMap(c => (1 to 4).map(i => (c, i.toLong))))
    assert(r.getDouble(r.fieldIndex("chi2")) == 0.0)
  }

  test("even pooled count takes the LOWER median") {
    // pooled 1,2,3,4: position (4+1) div 2 = 2 → median 2
    val r = mood(Seq(("X", 1L), ("X", 3L), ("Y", 2L), ("Y", 4L)))
    assert(r.getLong(r.fieldIndex("median_v")) == 2L)
  }

  test("degenerate: all mass at-or-below the median NULLs chi2") {
    val r = mood(Seq(("X", 7L), ("X", 7L), ("Y", 7L)))
    assert(r.getLong(r.fieldIndex("median_v")) == 7L)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }
}
