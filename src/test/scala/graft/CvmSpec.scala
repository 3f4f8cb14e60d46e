package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Cvm

/** Two-sample Cramér–von Mises (q201): exact hand cases (interleaved,
  * tied, identical), shift monotonicity, and the empty-class contract.
  * Value-level oracle equivalence runs through graft.Verify. */
class CvmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def t(xs: Seq[Long], ys: Seq[Long], g: String = "g1"): Map[String, Double] = {
    import spark.implicits._
    val df = (xs.map(v => (g, "X", v)) ++ ys.map(v => (g, "Y", v)))
      .toDF("grp", "cls", "v").repartition(5)
    Cvm.cvmTest(df, "grp", "cls", "X", "Y", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
  }

  test("interleaved hand case: T = 0.125 exactly") {
    // X={1,3}, Y={2,4}: gaps (in m·A1−n·A2 units, n=m=2) are 2,0,2,0
    // → S = 8, T = 8/(16·4) = 1/8
    assert(t(Seq(1L, 3L), Seq(2L, 4L)) == Map("g1" -> 0.125))
  }

  test("tied cells split exactly: T = 1/12") {
    // X={1,1,2}, Y={1,2,2}: cells (c=3, gap 3), (c=3, gap 0) → S = 27,
    // T = 27/(36·9) = 0.083333 on the round-6 grid
    assert(t(Seq(1L, 1L, 2L), Seq(1L, 2L, 2L)) == Map("g1" -> 0.083333))
  }

  test("identical samples: T = 0 exactly") {
    assert(t(Seq(1L, 2L, 5L), Seq(1L, 2L, 5L)) == Map("g1" -> 0.0))
  }

  test("shift monotonicity: a larger location shift integrates larger") {
    val base = Seq(1L, 2L, 3L, 4L)
    val t1 = t(base, base.map(_ + 1))("g1")
    val t2 = t(base, base.map(_ + 2))("g1")
    val t4 = t(base, base.map(_ + 4))("g1")
    assert(t1 < t2 && t2 < t4)
  }

  test("a group with one class empty is dropped, others unaffected") {
    import spark.implicits._
    val df = (Seq(("a", "X", 1L), ("a", "Y", 2L), ("b", "X", 1L)))
      .toDF("grp", "cls", "v")
    val out = Cvm.cvmTest(df, "grp", "cls", "X", "Y", "v").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a"))
  }
}
