package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.{Survival, Weibull}

/** Weibull plot fit (q281): parameter recovery from synthetic Weibull
  * survival data through the REAL KM chain, the exponential special
  * case, guards, and the registered shape. Value-level oracle
  * equivalence runs through graft.Verify. */
class WeibullSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** Uncensored synthetic Weibull(k, λ) durations via inverse-CDF on a
    * deterministic uniform grid, pushed through the real KM estimator
    * then the fit. */
  private def recover(k: Double, lam: Double, n: Int = 400) = {
    import spark.implicits._
    val obs = (1 to n).map { i =>
      val u = (i - 0.5) / n // uniform grid, no ties at 0/1
      val t = lam * math.pow(-math.log(u), 1.0 / k)
      ("a", math.max(1L, math.round(t)), 1)
    }
    val km = Survival.kaplanMeier(obs.toDF("g", "dur", "event").repartition(4))
    Weibull.weibullFit(km).collect().head
  }

  test("recovers shape and scale of Weibull(1.5, 200)") {
    val r = recover(1.5, 200.0)
    assert(math.abs(r.getDouble(r.fieldIndex("shape_k")) - 1.5) < 0.1)
    assert(math.abs(r.getDouble(r.fieldIndex("scale_days")) - 200.0) < 12.0)
  }

  test("exponential special case: shape ≈ 1, scale ≈ the mean") {
    val r = recover(1.0, 100.0)
    assert(math.abs(r.getDouble(r.fieldIndex("shape_k")) - 1.0) < 0.08)
    assert(math.abs(r.getDouble(r.fieldIndex("scale_days")) - 100.0) < 8.0)
  }

  test("falling-hazard case: shape well below 1") {
    val r = recover(0.6, 150.0)
    val k = r.getDouble(r.fieldIndex("shape_k"))
    assert(k > 0.4 && k < 0.8)
  }

  test("fewer than 3 usable points: fit is NULL") {
    import spark.implicits._
    val km = Survival.kaplanMeier(
      Seq(("a", 5L, 1), ("a", 9L, 1)).toDF("g", "dur", "event"))
    val r = Weibull.weibullFit(km).collect().head
    // 2 event steps but the last has S = 0 (excluded) → 1 point
    assert(r.isNullAt(r.fieldIndex("shape_k")))
    assert(r.isNullAt(r.fieldIndex("scale_days")))
  }

  test("registered shape: one row per market segment") {
    val df = Weibull.segmentWeibull(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("c_mktsegment", "n_pts", "shape_k", "scale_days"))
    val rows = df.collect()
    assert(rows.length == 5)
    // churn-hazard shape must be positive where fitted
    rows.filter(!_.isNullAt(2)).foreach(r => assert(r.getDouble(2) > 0.0))
  }
}
