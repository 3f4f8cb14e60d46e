package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.EbShrink

/** Empirical-Bayes shrinkage (q252): driver-reference parity of the
  * cleared-integer prior fit, the small-n ranking fix (the reason the
  * operator exists), shrinkage proportionality, degenerate-prior
  * NULLs, and the registered brand table. Value-level oracle
  * equivalence runs through graft.Verify. */
class EbShrinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(cells: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    EbShrink.ebRates(cells.toDF("g", "n", "x")).collect()
      .map(r => r.getString(0) -> r).toMap
  }

  /** The same program on driver primitives. */
  private def ref(cells: Seq[(String, Long, Long)]):
      Map[String, Option[Double]] = {
    val ps = cells.map { case (_, n, x) => 1000000L * x / n }
    val k = ps.length.toLong
    val (sum, sum2) = (ps.map(BigInt(_)).sum, ps.map(p => BigInt(p) * p).sum)
    val num = k * sum2 - sum * sum
    val mStrength =
      if (num > 0)
        Some((sum * (BigInt(1000000) * k - sum) * (k - 1) - k * num)
          .toDouble / (k * num).toDouble)
      else None
    val mMean = sum.toDouble / (1000000.0 * k)
    cells.zip(ps).map { case ((g, n, x), _) =>
      g -> mStrength.filter(_ > 0.0).map { m =>
        BigDecimal((x.toDouble + mMean * m) / (n.toDouble + m))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
  }

  test("driver-reference parity on a mixed table") {
    val cells = Seq(("a", 100L, 40L), ("b", 3L, 3L), ("c", 1000L, 520L),
      ("d", 8L, 1L), ("e", 200L, 90L))
    val got = fit(cells)
    val want = ref(cells)
    cells.foreach { case (g, _, _) =>
      val r = got(g)
      want(g) match {
        case Some(v) => assert(r.getDouble(r.fieldIndex("eb_rate")) == v, g)
        case None => assert(r.isNullAt(r.fieldIndex("eb_rate")), g)
      }
    }
  }

  test("the ranking fix: a 3/3 group falls below a solid 8000/10000") {
    val cells = Seq(("tiny", 3L, 3L), ("big", 10000L, 8000L),
      ("mid1", 500L, 240L), ("mid2", 500L, 250L), ("mid3", 500L, 260L),
      ("mid4", 500L, 245L), ("mid5", 500L, 255L))
    val got = fit(cells)
    val tiny = got("tiny")
    val big = got("big")
    // raw says tiny (1.0) > big (0.8); EB reverses it
    assert(tiny.getDouble(tiny.fieldIndex("raw_rate")) >
      big.getDouble(big.fieldIndex("raw_rate")))
    assert(tiny.getDouble(tiny.fieldIndex("eb_rate")) <
      big.getDouble(big.fieldIndex("eb_rate")))
  }

  test("shrinkage is proportional to thinness of evidence") {
    val cells = Seq(("thin", 10L, 9L), ("thick", 10000L, 9000L),
      ("l1", 300L, 60L), ("l2", 300L, 120L), ("l3", 300L, 200L))
    val got = fit(cells)
    def pull(g: String) = {
      val r = got(g)
      math.abs(r.getDouble(r.fieldIndex("raw_rate")) -
        r.getDouble(r.fieldIndex("eb_rate")))
    }
    assert(pull("thin") > pull("thick") * 5)
  }

  test("degenerate priors are NULL: equal rates, and over-dispersion") {
    // all rates identical -> num = 0 -> no prior
    val eq = fit(Seq(("a", 10L, 5L), ("b", 100L, 50L), ("c", 4L, 2L)))
    eq.values.foreach(r => assert(r.isNullAt(r.fieldIndex("eb_rate"))))
    // rates at the extremes -> v > m(1-m) -> M <= 0 -> NULL
    val od = fit(Seq(("a", 100L, 0L), ("b", 100L, 100L),
      ("c", 100L, 0L), ("d", 100L, 100L)))
    od.values.foreach(r => assert(r.isNullAt(r.fieldIndex("eb_rate"))))
  }

  test("registered q252 at sf0.001: 25 brands, EB between raw and prior") {
    val rows = EbShrink.brandReturnEb(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val raw = r.getDouble(r.fieldIndex("raw_rate"))
      val eb = r.getDouble(r.fieldIndex("eb_rate"))
      val m = r.getDouble(r.fieldIndex("prior_m"))
      // posterior mean lies between the raw rate and the prior mean
      assert(eb >= math.min(raw, m) - 1e-6 && eb <= math.max(raw, m) + 1e-6,
        s"${r.getString(0)}: raw $raw eb $eb m $m")
    }
  }
}
