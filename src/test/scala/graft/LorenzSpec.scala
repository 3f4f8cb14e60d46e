package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Lorenz

/** Lorenz-curve invariants. Value-level oracle equivalence runs
  * through graft.Verify. */
class LorenzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def run(obs: Seq[(String, Long)])
      : Map[(String, Int), (Long, Double, Double)] = {
    import spark.implicits._
    Lorenz.lorenzDeciles(obs.toDF("g", "v"), "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
  }

  test("perfect equality: L(d) = d/10 exactly") {
    val got = run((1 to 10).map(i => ("a", 100L)))
    (1 to 10).foreach { d =>
      val (n, pop, vs) = got(("a", d))
      assert(n == 10 && pop == d / 10.0 && vs == d / 10.0)
    }
  }

  test("total concentration: L(d) = 0 until the holder's decile") {
    val got = run(Seq.fill(9)(("a", 1L)) :+ ("a", 991L))
    (1 to 9).foreach(d => assert(got(("a", d))._3 == d / 1000.0))
    assert(got(("a", 10))._3 == 1.0)
  }

  test("hand case: bottom half holds its exact cumulative share") {
    // values 1,2,3,4: total 10; after 2 of 4 members cum = 3/10
    val got = run(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)))
    assert(got(("a", 5))._3 == 0.3)
    assert(got(("a", 10))._3 == 1.0)
    // decile 3 also reads at the 2nd member (10*2 >= 3*4)
    assert(got(("a", 3)) == got(("a", 5)))
  }

  test("nonpositive values are excluded; groups independent") {
    val got = run(Seq(("a", -5L), ("a", 0L), ("a", 10L), ("b", 1L), ("b", 1L)))
    assert(got(("a", 10)) == ((1L, 1.0, 1.0)))
    assert(got(("b", 5))._3 == 0.5)
  }

  test("q123 over testdata: 10 deciles per segment, monotone, ends at 1") {
    val rows = Lorenz.segmentLorenz(spark, dir).collect()
    val bySeg = rows.groupBy(_.getString(0))
    assert(bySeg.size == 5)
    bySeg.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 10))
      val vs = sorted.map(_.getDouble(4))
      assert(vs.zip(vs.tail).forall { case (x, y) => x <= y })
      assert(vs.last == 1.0)
      // inequality: the curve sits below the diagonal
      sorted.foreach(r => assert(r.getDouble(4) <= r.getDouble(3) + 1e-9))
    }
  }
}
