package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import dedup.Novelty
import operators.PropTest

/** q274 novelty + q275 power/MDE: bracket cases and direct-double
  * cross-checks. Value-level oracle equivalence runs through
  * graft.Verify. */
class NoveltyPowerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("q274 registered: rate in (0, 1], counts consistent") {
    val r = Novelty.snapshotNovelty(spark, "/root/testdata/sf0.001")
      .collect().head
    val (nb, nn, nv) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nb > 0 && nn > 0)
    assert(nv <= nn)
    val rate = r.getDouble(r.fieldIndex("novelty_rate"))
    assert(rate >= 0.0 && rate <= 1.0)
    assert(math.abs(rate - nv.toDouble / nn) < 1e-5)
  }

  test("q275: MDE and n-per-arm match the closed form") {
    val rows = PropTest.conversionPowerMde(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_units")).toDouble
      val p = r.getLong(r.fieldIndex("converters")).toDouble / n
      val zsum = 1.959963984540054 + 0.8416212335729143
      val mde = zsum * math.sqrt(2 * p * (1 - p) / (n / 2))
      val nArm = math.ceil(2 * zsum * zsum * p * (1 - p) /
        math.pow(0.05 * p, 2))
      assert(math.abs(r.getDouble(r.fieldIndex("mde_abs")) - mde) < 1e-5)
      assert(r.getLong(r.fieldIndex("n_arm_5pct_lift")).toDouble == nArm)
      // a rarer conversion needs MORE units for the same relative lift
    }
    val byP = rows.sortBy(r =>
      r.getLong(r.fieldIndex("converters")))
    if (byP.head.getLong(byP.head.fieldIndex("converters")) <
      byP.last.getLong(byP.last.fieldIndex("converters")))
      assert(byP.head.getLong(byP.head.fieldIndex("n_arm_5pct_lift")) >=
        byP.last.getLong(byP.last.fieldIndex("n_arm_5pct_lift")))
  }
}
