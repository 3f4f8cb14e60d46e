package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.BlockMaxima

/** Gumbel block maxima (q199): hand-computed method-of-moments fit,
  * return-level monotonicity, the variance-free collapse, and the
  * n < 2 NULL. Value-level oracle equivalence runs through
  * graft.Verify. */
class BlockMaximaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private val Gamma = 0.5772156649015329
  private val S6Pi = 0.7796968012336793

  private def bm(maxima: Seq[Long], unit: Double = 1.0) = {
    import spark.implicits._
    BlockMaxima.gumbelReturnLevels(
      maxima.zipWithIndex.map { case (m, i) => (i.toLong, m) }
        .toDF("b", "mx").repartition(3), unit)
      .collect().head
  }

  test("hand case {10,20,30,40}: MoM fit and the 12-block return level") {
    val r = bm(Seq(10L, 20L, 30L, 40L))
    val s = math.sqrt(500.0 / 3.0)
    val beta = S6Pi * s
    val mu = 25.0 - Gamma * beta
    assert(r.getDouble(r.fieldIndex("mean_max")) == 25.0)
    assert(math.abs(r.getDouble(r.fieldIndex("gumbel_beta")) - beta) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("gumbel_mu")) - mu) < 1e-3)
    val rl12 = mu - beta * math.log(-math.log(1.0 - 1.0 / 12.0))
    assert(math.abs(r.getDouble(r.fieldIndex("rl_12")) - rl12) < 1e-3)
  }

  test("longer horizons demand higher levels: rl_12 < rl_60 < rl_120") {
    val r = bm(Seq(10L, 25L, 18L, 40L, 31L, 22L))
    assert(r.getDouble(r.fieldIndex("rl_12")) <
      r.getDouble(r.fieldIndex("rl_60")))
    assert(r.getDouble(r.fieldIndex("rl_60")) <
      r.getDouble(r.fieldIndex("rl_120")))
  }

  test("constant maxima: β = 0, every return level equals the mean") {
    val r = bm(Seq.fill(6)(70L))
    assert(r.getDouble(r.fieldIndex("gumbel_beta")) == 0.0)
    assert(r.getDouble(r.fieldIndex("rl_120")) == 70.0)
  }

  test("a single block cannot be fitted: NULL") {
    val r = bm(Seq(42L))
    assert(r.isNullAt(r.fieldIndex("gumbel_mu")))
    assert(r.isNullAt(r.fieldIndex("rl_12")))
  }

  test("unit scaling applies to every level") {
    val cents = bm(Seq(1000L, 2000L, 3000L, 4000L), unit = 0.01)
    assert(cents.getDouble(cents.fieldIndex("mean_max")) == 25.0)
  }
}
