package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.TemperatureMix

/** Temperature mix (q233): exact snapped-weight hand values at T = 2,
  * the uniform fixed point, compression ordering. Value-level oracle
  * equivalence runs through graft.Verify. */
class TemperatureMixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def mix(counts: Map[String, Int]) = {
    import spark.implicits._
    val rows = counts.toSeq.flatMap { case (g, n) => Seq.fill(n)(g) }
    TemperatureMix.temperatureMix(rows.toDF("g").repartition(4))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("equal domains are the fixed point: shares 0.5, rate 1") {
    val m = mix(Map("a" -> 100, "b" -> 100))
    assert(d(m("a"), "share_temp") == 0.5)
    assert(d(m("a"), "rate") == 1.0)
  }

  test("100:1 at T = 2 compresses to √-scale: 10:1 exactly") {
    // w ∝ c^(1/2) on the snapped ln/exp chain: (10e6, 1e6) micro →
    // shares (0.909091, 0.090909); the tail upsamples 9.181818×
    val m = mix(Map("a" -> 100, "b" -> 1))
    assert(d(m("a"), "share_natural") == 0.990099)
    assert(d(m("a"), "share_temp") == 0.909091)
    assert(d(m("b"), "share_temp") == 0.090909)
    assert(d(m("b"), "rate") == 9.181818)
    assert(d(m("a"), "rate") == 0.918182)
  }

  test("temperature moves every mix TOWARD uniform, never past it") {
    val m = mix(Map("a" -> 64, "b" -> 16, "c" -> 4))
    val natA = d(m("a"), "share_natural")
    val tmpA = d(m("a"), "share_temp")
    assert(tmpA < natA && tmpA > 1.0 / 3.0)
    val natC = d(m("c"), "share_natural")
    val tmpC = d(m("c"), "share_temp")
    assert(tmpC > natC && tmpC < 1.0 / 3.0)
  }
}
