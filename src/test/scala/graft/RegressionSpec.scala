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

  test("grouped WLS recovers DIFFERENT planted models per group exactly") {
    // group g gets y = g + (g+1)·x1 − 0.25·g·x2: each group's fit must
    // return ITS OWN coefficients — proof the fits are independent
    val rows = Tables.customer(spark, dir)
      .select(
        (col("c_custkey") % 3).cast("long").as("g"),
        (col("c_custkey") % 7 + 1).cast("double").as("w"),
        (col("c_acctbal") / 1000.0).as("x1"),
        (col("c_custkey") % 13).cast("double").as("x2"))
      .withColumn("y",
        col("g") + (col("g") + 1) * col("x1") - lit(0.25) * col("g") * col("x2"))
    val fits = Regression.wlsFitBy(rows, Seq("g")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    (0L to 2L).foreach { g =>
      val (b0, b1, b2) = fits(g)
      assert(math.abs(b0 - g) < 1e-4, s"g=$g intercept $b0")
      assert(math.abs(b1 - (g + 1)) < 1e-4, s"g=$g b_x1 $b1")
      assert(math.abs(b2 + 0.25 * g) < 1e-4, s"g=$g b_x2 $b2")
    }
  }

  test("grouped WLS guards degenerate groups with NULLs, not garbage") {
    import spark.implicits._
    // group 'tiny' has 2 rows (underdetermined), 'flat' has constant x1
    // AND constant x2 (singular); 'ok' is well-posed
    val rows = (
      Seq(("tiny", 1.0, 1.0, 1.0, 1.0), ("tiny", 1.0, 2.0, 1.0, 2.0)) ++
      (1 to 20).map(i => ("flat", 1.0, 5.0, 7.0, i.toDouble)) ++
      (1 to 20).map(i => ("ok", 1.0, i.toDouble, (i * i % 11).toDouble, 1.0 + 2.0 * i))
    ).toDF("g", "w", "x1", "x2", "y")
    val fits = Regression.wlsFitBy(rows, Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fits("tiny").isNullAt(2) && fits("flat").isNullAt(2))
    assert(!fits("ok").isNullAt(2) && math.abs(fits("ok").getDouble(3) - 2.0) < 1e-4)
  }

  test("q89 per-nation fits: 25 rows, each well-posed at this SF") {
    val fits = Regression.regressionByNation(spark, dir)
    assert(fits.count() == 25)
    assert(fits.filter(col("b_intercept").isNull).count() == 0)
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
