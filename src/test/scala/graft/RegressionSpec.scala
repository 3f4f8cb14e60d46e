package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Regression

/** Weighted regression invariants at sf0.001: solver exactness on a
  * planted linear model, engine/driver solve parity, weight semantics,
  * and the IRLS quasibinomial score equation. */
class RegressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("wlsFit recovers a planted exact linear model to round-6") {
    // y = 2 + 3·x1 − 0.5·x2 exactly, arbitrary positive weights:
    // residuals are 0, so WLS must return the planted coefficients
    // (up to the 1e-6 fixed-point snap) and r2 = 1
    val rows = Tables.customer(spark, dir)
      .select(
        (col("c_custkey") % 7 + 1).cast("double").as("w"),
        (col("c_acctbal") / 1000.0).as("x1"),
        (col("c_custkey") % 13).cast("double").as("x2"))
      .withColumn("y", lit(2.0) + lit(3.0) * col("x1") - lit(0.5) * col("x2"))
    val fit = Regression.wlsFit(rows).head()
    assert(math.abs(fit.getDouble(1) - 2.0) < 1e-4, s"intercept ${fit.getDouble(1)}")
    assert(math.abs(fit.getDouble(2) - 3.0) < 1e-4, s"b_x1 ${fit.getDouble(2)}")
    assert(math.abs(fit.getDouble(3) + 0.5) < 1e-4, s"b_x2 ${fit.getDouble(3)}")
    assert(math.abs(fit.getDouble(4) - 1.0) < 1e-4, s"r2 ${fit.getDouble(4)}")
  }

  test("q32 registered fit: one row, finite coefficients, r2 in [0, 1]") {
    val fit = Regression.regression(spark, dir)
    assert(fit.count() == 1)
    val r = fit.head()
    (1 to 3).foreach(i => assert(!r.getDouble(i).isNaN && !r.getDouble(i).isInfinite))
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"r2 ${r.getDouble(4)}")
  }

  test("engine-side solve matches the driver-side solve used by IRLS") {
    val rows = Regression.regressionRows(spark, dir)
    val engine = Regression.wlsFit(rows).head()
    val driver = Regression.wlsFitCollect(rows)
    // the engine output is round-6; the driver solve is unrounded
    assert(math.abs(engine.getDouble(1) - driver.b0) <= 5e-7)
    assert(math.abs(engine.getDouble(2) - driver.b1) <= 5e-7)
    assert(math.abs(engine.getDouble(3) - driver.b2) <= 5e-7)
    assert(engine.getLong(0) == driver.n)
  }

  test("uniformly scaling all weights leaves the fit unchanged") {
    val rows = Regression.regressionRows(spark, dir)
    val scaled = rows.withColumn("w", col("w") * 4.0)
    val a = Regression.wlsFitCollect(rows)
    val b = Regression.wlsFitCollect(scaled)
    assert(math.abs(a.b0 - b.b0) < 1e-6 && math.abs(a.b1 - b.b1) < 1e-6
      && math.abs(a.b2 - b.b2) < 1e-6)
  }

  test("IRLS quasibinomial satisfies the intercept score equation Σw(y−μ)≈0") {
    val rows = Regression.regressionRows(spark, dir).cache()
    val fit = Regression.glmQuasibinomial(rows)
    val eta = lit(fit.b0) + lit(fit.b1) * col("x1") + lit(fit.b2) * col("x2")
    val score = rows
      .select((col("w") * (col("y") - lit(1.0) / (lit(1.0) + exp(-eta)))).as("s"))
      .agg(sum("s")).head().getDouble(0)
    val totalW = rows.agg(sum("w")).head().getDouble(0)
    assert(math.abs(score / totalW) < 1e-6, s"normalized score ${score / totalW}")
  }
}
