package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.WeightedQuantile

/** Weighted-quantile invariants. Value-level oracle equivalence runs
  * through graft.Verify. */
class WeightedQuantileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def run(obs: Seq[(String, Long, Long)], pcts: Seq[Int])
      : Map[String, org.apache.spark.sql.Row] = {
    import spark.implicits._
    WeightedQuantile.weightedQuantiles(
      obs.toDF("g", "v", "w"), "g", "v", "w", pcts)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("unit weights reduce to the plain lower quantile") {
    val obs = (1L to 10L).map(v => ("a", v, 1L))
    val r = run(obs, Seq(25, 50, 75, 90, 100))("a")
    assert(r.getLong(1) == 10)
    assert((2 to 6).map(r.getLong) == Seq(3L, 5L, 8L, 9L, 10L))
    assert(r.getDouble(7) == 5.5)
  }

  test("a dominant weight pins every interior quantile") {
    val obs = Seq(("a", 1L, 1L), ("a", 7L, 98L), ("a", 9L, 1L))
    val r = run(obs, Seq(25, 50, 75, 90))("a")
    assert((2 to 5).map(r.getLong).forall(_ == 7L))
    assert(r.getDouble(6) == 6.96)
  }

  test("nonpositive weights are excluded; groups are independent") {
    val obs = Seq(("a", 100L, 0L), ("a", 1L, 1L), ("a", 5L, 1L),
      ("b", 42L, 3L), ("b", 50L, -2L))
    val got = run(obs, Seq(50))
    assert(got("a").getLong(1) == 2 && got("a").getLong(2) == 1)
    assert(got("b").getLong(1) == 3 && got("b").getLong(2) == 42)
  }

  test("exact boundary: cumulative share equal to the threshold counts") {
    // weights 1,1,2: W=4; p50 needs cum >= 2 -> v=2 (cum exactly 2)
    val r = run(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 2L)), Seq(50))("a")
    assert(r.getLong(2) == 2)
  }

  test("q120 over testdata: quantiles monotone, bounded by the value range") {
    val rows = WeightedQuantile.lineitemWeightedQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qs = (2 to 5).map(r.getLong)
      assert(qs == qs.sorted, s"monotone quantiles: $qs")
      assert(r.getDouble(6) > 0)
    }
  }
}
