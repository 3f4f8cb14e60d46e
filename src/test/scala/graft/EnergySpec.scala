package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Energy

/** Energy distance (q279): hand-computed Székely identities against
  * the grid form, a direct pairwise cross-check, identical samples,
  * and the registered shape. Value-level oracle equivalence runs
  * through graft.Verify. */
class EnergySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def dist(rows: Seq[(String, Long)], unit: Double = 1.0) = {
    import spark.implicits._
    Energy.energyOneVsRest(rows.toDF("g", "v").repartition(4), unit)
      .collect().map(r => r.getString(r.fieldIndex("g")) -> r).toMap
  }

  /** Direct Székely form over ordered pairs (independent copies):
    * 2·E|X−Y| − E|X−X'| − E|Y−Y'|. */
  private def direct(xs: Seq[Long], ys: Seq[Long]): Double = {
    def mad(a: Seq[Long], b: Seq[Long]) =
      a.flatMap(x => b.map(y => math.abs(x - y).toDouble)).sum / (a.size * b.size)
    2 * mad(xs, ys) - mad(xs, xs) - mad(ys, ys)
  }

  test("two singletons one apart: D² = 2, T = 1") {
    val m = dist(Seq(("a", 0L), ("b", 1L)))
    val ra = m("a")
    assert(ra.getDouble(ra.fieldIndex("e_dist")) == 2.0)
    assert(ra.getDouble(ra.fieldIndex("t_energy")) == 1.0)
  }

  test("X={0,2} vs Y={1}: grid form equals the Székely pairwise form") {
    val m = dist(Seq(("a", 0L), ("a", 2L), ("b", 1L)))
    val r = m("a")
    assert(r.getDouble(r.fieldIndex("e_dist")) ==
      direct(Seq(0L, 2L), Seq(1L)))
  }

  test("larger interleaved samples match the direct pairwise computation") {
    val xs = Seq(1L, 3L, 3L, 7L, 9L, 12L)
    val ys = Seq(2L, 2L, 5L, 8L, 8L, 10L, 15L)
    val m = dist(xs.map(("a", _)) ++ ys.map(("b", _)))
    val r = m("a")
    assert(math.abs(r.getDouble(r.fieldIndex("e_dist")) -
      direct(xs, ys)) < 1e-6)
    val t = xs.size.toDouble * ys.size / (xs.size + ys.size) * direct(xs, ys)
    assert(math.abs(r.getDouble(r.fieldIndex("t_energy")) - t) < 1e-5)
  }

  test("identical distributions: distance exactly 0") {
    val m = dist((0 until 10).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong))))
    val r = m("a")
    assert(r.getDouble(r.fieldIndex("e_dist")) == 0.0)
    assert(r.getDouble(r.fieldIndex("t_energy")) == 0.0)
  }

  test("unit scaling multiplies the distance") {
    val rows = Seq(("a", 0L), ("b", 1L))
    val m1 = dist(rows, 1.0)("a").getDouble(3)
    val m100 = dist(rows, 100.0)("a").getDouble(3)
    assert(m100 == 100.0 * m1)
  }

  test("registered shape: one row per order priority") {
    val df = Energy.priorityPriceEnergy(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("o_orderpriority", "n_seg", "n_rest", "e_dist", "t_energy"))
    assert(df.count() == 5)
  }
}
