package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Did

/** Difference-in-differences invariants. Value-level oracle
  * equivalence runs through graft.Verify. */
class DidSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def run(obs: Seq[(Boolean, Boolean, Double)])
      : org.apache.spark.sql.Row = {
    import spark.implicits._
    Did.did(obs.toDF("t", "p", "y"), "t", "p", "y", 100).collect().head
  }

  test("planted parallel-trends violation recovers the effect exactly") {
    // control: 10 -> 12 (secular +2); treated: 20 -> 25 (+5); DiD = 3
    val obs =
      Seq.fill(4)((false, false, 10.0)) ++ Seq.fill(4)((false, true, 12.0)) ++
      Seq.fill(4)((true, false, 20.0)) ++ Seq.fill(4)((true, true, 25.0))
    val r = run(obs)
    assert(Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      .forall(_ == 4))
    assert(r.getDouble(4) == 25.0 && r.getDouble(5) == 20.0)
    assert(r.getDouble(6) == 12.0 && r.getDouble(7) == 10.0)
    assert(r.getDouble(8) == 3.0)
    // zero within-cell variance -> SE 0 -> t NULL via nullif
    assert(r.getDouble(9) == 0.0 && r.isNullAt(10))
    assert(r.getLong(11) == 12)
  }

  test("matches an independent OLS interaction computation under noise") {
    val obs = Seq(
      (false, false, 9.5), (false, false, 10.5), (false, false, 10.2),
      (false, true, 12.1), (false, true, 11.8), (false, true, 12.4),
      (true, false, 19.7), (true, false, 20.6), (true, false, 20.1),
      (true, true, 25.3), (true, true, 24.6), (true, true, 25.2))
    val r = run(obs)
    // independent recompute: cell means on snapped cents, pooled SSR
    def cell(t: Boolean, p: Boolean) =
      obs.filter(o => o._1 == t && o._2 == p).map(o => math.floor(o._3 * 100))
    val cells = Seq(cell(true, true), cell(true, false),
      cell(false, true), cell(false, false))
    val means = cells.map(c => c.sum / c.length)
    val wantDid = (means(0) - means(1)) - (means(2) - means(3))
    val ssr = cells.map(c => c.map(v => math.pow(v - c.sum / c.length, 2)).sum).sum
    val s2 = ssr / (obs.length - 4)
    val se = math.sqrt(s2 * cells.map(c => 1.0 / c.length).sum)
    assert(math.abs(r.getDouble(8) - wantDid / 100) < 1e-6)
    assert(math.abs(r.getDouble(9) - se / 100) < 1e-6)
    assert(math.abs(r.getDouble(10) - wantDid / se) < 1e-6)
  }

  test("swapping treatment and control flips the sign") {
    val obs = Seq(
      (false, false, 9.5), (false, false, 10.5), (false, true, 12.1),
      (false, true, 11.8), (true, false, 19.7), (true, false, 20.6),
      (true, true, 25.3), (true, true, 24.6))
    val a = run(obs)
    val b = run(obs.map(o => (!o._1, o._2, o._3)))
    assert(math.abs(a.getDouble(8) + b.getDouble(8)) < 1e-9)
    assert(math.abs(a.getDouble(9) - b.getDouble(9)) < 1e-9)
  }

  test("q119 over testdata: four populated cells, finite estimate") {
    val r = Did.segmentDid(spark, dir).collect().head
    assert((0 to 3).forall(i => r.getLong(i) > 0))
    assert(!r.isNullAt(8) && !r.isNullAt(9) && !r.isNullAt(10))
    assert(r.getLong(11) ==
      (0 to 3).map(r.getLong).sum - 4)
  }
}
