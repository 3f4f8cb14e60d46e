package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Basket

/** Association-rule invariants. Value-level oracle equivalence runs
  * through graft.Verify. */
class BasketSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def rules(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Basket.associationRules(rows.toDF("ok", "item"), "ok", "item")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9)))
      .toMap
  }

  test("planted baskets: counts, support, confidence, lift by hand") {
    // baskets: 1={A,B} 2={A,B} 3={A,C} 4={B}
    val got = rules(Seq(
      1L -> "A", 1L -> "B", 2L -> "A", 2L -> "B",
      3L -> "A", 3L -> "C", 4L -> "B"))
    assert(got.keySet == Set(("A", "B"), ("A", "C")))
    val (na, nb, nab, nbk, sup, cab, cba, lift) = got(("A", "B"))
    assert((na, nb, nab, nbk) == ((3L, 3L, 2L, 4L)))
    assert(sup == 0.5)
    assert(cab == 0.666667 && cba == 0.666667) // 2/3
    assert(lift == 0.888889)                   // 2*4/(3*3)
    val (_, nc, nac, _, supAC, _, confCA, liftAC) = got(("A", "C"))
    assert((nc, nac) == ((1L, 1L)))
    assert(supAC == 0.25 && confCA == 1.0)
    assert(liftAC == 1.333333) // 1*4/(3*1)
  }

  test("multiplicity within one basket does not strengthen a rule") {
    val plain = rules(Seq(1L -> "A", 1L -> "B", 2L -> "A"))
    val dup = rules(Seq(
      1L -> "A", 1L -> "A", 1L -> "B", 1L -> "B", 1L -> "B", 2L -> "A"))
    assert(plain == dup)
  }

  test("lift identity holds on real data; pairs are strictly ordered") {
    val out = Basket.brandRules(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair must be a < b")
      val (na, nb, np, nbk) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(np <= math.min(na, nb) && math.max(na, nb) <= nbk)
      val lift = r.getDouble(9)
      val expect = np.toDouble * nbk / (na.toDouble * nb)
      assert(math.abs(lift - expect) < 1e-6, s"lift $lift vs $expect")
    }
  }
}
