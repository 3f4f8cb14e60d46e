package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.NegBin

/** Negative-binomial MoM fit (q253): hand-exact parameter recovery,
  * the moment-matching identity, the Poisson-or-under NULL, group
  * isolation, and the registered q189-cohort fit. Value-level oracle
  * equivalence runs through graft.Verify. */
class NegBinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(cs: Seq[Long], g: String = "g1") = {
    import spark.implicits._
    NegBin.nbFit(cs.map((g, _)).toDF("g", "c")).collect().head
  }

  test("hand case: counts (0,1,2,3,10) -> r = 0.8192, p = 64/314 exact") {
    val row = fit(Seq(0L, 1L, 2L, 3L, 10L))
    assert(row.getDouble(row.fieldIndex("mean")) == 3.2)
    assert(row.getDouble(row.fieldIndex("variance")) == 15.7)
    assert(row.getDouble(row.fieldIndex("nb_r")) == 0.8192)
    // p = S(n-1)/(nQ - S^2) = 64/314 = 0.203821...
    assert(row.getDouble(row.fieldIndex("nb_p")) == 0.203822)
  }

  test("moment matching: fitted (r, p) reproduce mean and variance") {
    val cs = Seq(2L, 7L, 0L, 12L, 4L, 4L, 9L, 1L, 0L, 6L)
    val row = fit(cs)
    val (r, p) = (row.getDouble(row.fieldIndex("nb_r")),
      row.getDouble(row.fieldIndex("nb_p")))
    val m = row.getDouble(row.fieldIndex("mean"))
    val v = row.getDouble(row.fieldIndex("variance"))
    assert(math.abs(r * (1 - p) / p - m) < 1e-3)
    assert(math.abs(m + m * m / r - v) < 1e-2)
  }

  test("Poisson-or-under is NULL, not a garbage fit") {
    // constant counts: variance 0 < mean
    val row = fit(Seq(5L, 5L, 5L, 5L))
    assert(row.isNullAt(row.fieldIndex("nb_r")))
    assert(row.isNullAt(row.fieldIndex("nb_p")))
    assert(row.getDouble(row.fieldIndex("mean")) == 5.0)
    // alternating 4/6: var = 4/3 * ... still under mean 5
    val row2 = fit(Seq(4L, 6L, 4L, 6L))
    assert(row2.isNullAt(row2.fieldIndex("nb_r")))
  }

  test("groups fit independently") {
    import spark.implicits._
    val rows = NegBin.nbFit(
      (Seq(0L, 1L, 2L, 3L, 10L).map(("a", _)) ++
        Seq(5L, 5L, 5L).map(("b", _))).toDF("g", "c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getDouble(rows("a").fieldIndex("nb_r")) == 0.8192)
    assert(rows("b").isNullAt(rows("b").fieldIndex("nb_r")))
  }

  test("registered q253 at sf0.001: 5 priorities on the q189 cohort") {
    val rows = NegBin.dailyOrderNegBin(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_periods")) > 2000L) // dense spine
      val m = r.getDouble(r.fieldIndex("mean"))
      assert(m > 0.0 && m < 10.0)
      // wherever a fit exists it must be overdispersion-consistent
      if (!r.isNullAt(r.fieldIndex("nb_r"))) {
        assert(r.getDouble(r.fieldIndex("variance")) > m)
        assert(r.getDouble(r.fieldIndex("nb_p")) > 0.0 &&
          r.getDouble(r.fieldIndex("nb_p")) < 1.0)
      }
    }
  }
}
