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

  test("incremental WLS: scrambled batch folds equal the full recompute EXACTLY") {
    import spark.implicits._
    val all = (0 until 90).map { i =>
      (i % 3, (1 + i % 5).toDouble, (i % 11).toDouble / 3.0,
        (i % 7).toDouble, 1.5 + 0.7 * (i % 11) / 3.0 - 0.2 * (i % 7) + (i % 13) * 0.01)
    }
    val full = all.toDF("g", "w", "x1", "x2", "y")
    // batches arrive out of order and unevenly sized
    val batches = Seq(all.drop(60), all.take(20), all.slice(20, 60))
      .map(_.toDF("g", "w", "x1", "x2", "y"))
    val state = batches.map(Regression.wlsPartial(_, Seq("g")))
      .reduce(Regression.wlsMerge(_, _, Seq("g")))
    val inc = Regression.wlsSolveState(state, Seq("g"))
      .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    val direct = Regression.wlsFitBy(full, Seq("g"))
      .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    assert(inc == direct) // bitwise: integer sums are order-free
    // empty-delta identity
    val empty = Regression.wlsPartial(full.filter(lit(false)), Seq("g"))
    val state2 = Regression.wlsMerge(state, empty, Seq("g"))
    val inc2 = Regression.wlsSolveState(state2, Seq("g"))
      .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    assert(inc2 == direct)
  }

  test("constant-y input: NULL r2, not a divide-by-zero") {
    import spark.implicits._
    // y identical everywhere: SST = 0 exactly, so R² is undefined —
    // the fit must still return (b0 = y, slopes ≈ 0) with r2 NULL
    val rows = (1 to 30)
      .map(i => (1.0, i.toDouble, (i * i % 7).toDouble, 4.25))
      .toDF("w", "x1", "x2", "y")
    val fit = Regression.wlsFit(rows).head()
    assert(math.abs(fit.getDouble(1) - 4.25) < 1e-4)
    assert(math.abs(fit.getDouble(2)) < 1e-4 && math.abs(fit.getDouble(3)) < 1e-4)
    assert(fit.isNullAt(4), "r2 must be NULL on zero SST")
  }

  test("uniformly scaling all weights leaves the fit unchanged") {
    val rows = Regression.regressionRows(spark, dir)
    val scaled = rows.withColumn("w", col("w") * 4.0)
    val a = Regression.wlsFitCollect(rows)
    val b = Regression.wlsFitCollect(scaled)
    assert(math.abs(a.b0 - b.b0) < 1e-6 && math.abs(a.b1 - b.b1) < 1e-6
      && math.abs(a.b2 - b.b2) < 1e-6)
  }

  test("q94 glmInference matches an independent full-precision IRLS on a planted GLM") {
    import spark.implicits._
    // planted quasibinomial data: deterministic covariates, mean from a
    // known β, deterministic over/under-shoot noise (no Random — the
    // same rows rebuild identically everywhere)
    val bTrue = (-0.4, 0.8, -0.6)
    val data = (0 until 400).map { i =>
      val w = (5 + i % 20).toDouble
      val x1 = ((i * 7) % 23).toDouble / 23.0 * 4.0 - 2.0
      val x2 = ((i * 13) % 17).toDouble / 17.0 * 2.0 - 1.0
      val mu = 1.0 / (1.0 + math.exp(-(bTrue._1 + bTrue._2 * x1 + bTrue._3 * x2)))
      val y = math.min(0.98, math.max(0.02, mu + 0.15 * math.sin(i * 1.7)))
      (w, x1, x2, y)
    }
    // independent reference: plain-double IRLS (no fixed point, no μ
    // snap) run to fixed point, then the textbook inference formulas
    def solve(rows: Seq[(Double, Double, Double, Double)]): (Double, Double, Double) = {
      var (sw, sx1, sx2, sx11, sx12, sx22, sy, sx1y, sx2y) =
        (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      rows.foreach { case (w, x1, x2, y) =>
        sw += w; sx1 += w * x1; sx2 += w * x2
        sx11 += w * x1 * x1; sx12 += w * x1 * x2; sx22 += w * x2 * x2
        sy += w * y; sx1y += w * x1 * y; sx2y += w * x2 * y
      }
      val det = sw * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
      val d0 = sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y)
      val d1 = sw * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
      val d2 = sw * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)
      (d0 / det, d1 / det, d2 / det)
    }
    var b = solve(data)
    for (_ <- 0 until 25) {
      val working = data.map { case (w, x1, x2, y) =>
        val eta = b._1 + b._2 * x1 + b._3 * x2
        val mu = 1.0 / (1.0 + math.exp(-eta))
        (w * mu * (1.0 - mu), x1, x2, eta + (y - mu) / (mu * (1.0 - mu)))
      }
      b = solve(working)
    }
    // inference at the fixed point
    var (sw, sx1, sx2, sx11, sx12, sx22, prs) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    data.foreach { case (w, x1, x2, y) =>
      val mu = 1.0 / (1.0 + math.exp(-(b._1 + b._2 * x1 + b._3 * x2)))
      val wm = w * mu * (1.0 - mu)
      sw += wm; sx1 += wm * x1; sx2 += wm * x2
      sx11 += wm * x1 * x1; sx12 += wm * x1 * x2; sx22 += wm * x2 * x2
      prs += w * (y - mu) * (y - mu) / (mu * (1.0 - mu))
    }
    val det = sw * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val phi = prs / (data.size - 3).toDouble
    val seRef = Seq(
      math.sqrt(phi * (sx11 * sx22 - sx12 * sx12) / det),
      math.sqrt(phi * (sw * sx22 - sx2 * sx2) / det),
      math.sqrt(phi * (sw * sx11 - sx1 * sx1) / det))

    val got = Regression.glmInference(data.toDF("w", "x1", "x2", "y"), iters = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    val bRef = Seq(b._1, b._2, b._3)
    Seq("intercept", "x1", "x2").zipWithIndex.foreach { case (term, j) =>
      val r = got(term)
      assert(math.abs(r.getDouble(1) - bRef(j)) < 1e-3, s"$term estimate ${r.getDouble(1)} vs ${bRef(j)}")
      assert(math.abs(r.getDouble(2) - seRef(j)) < 1e-3, s"$term se ${r.getDouble(2)} vs ${seRef(j)}")
      assert(math.abs(r.getDouble(3) - bRef(j) / seRef(j)) < 2e-2, s"$term t")
      assert(math.abs(r.getDouble(5) - phi) < 1e-3, s"dispersion ${r.getDouble(5)} vs $phi")
      assert(r.getLong(6) == 400)
      val p = r.getDouble(4)
      assert(p >= 0.0 && p <= 1.0)
    }
    // recovery: the planted coefficients are inside ~noise distance
    assert(math.abs(bRef(0) - bTrue._1) < 0.3 && math.abs(bRef(1) - bTrue._2) < 0.3
      && math.abs(bRef(2) - bTrue._3) < 0.3)
    // strong effects carry small p; p is monotone-decreasing in |t|
    val byT = Seq("intercept", "x1", "x2").map(t => (math.abs(got(t).getDouble(3)), got(t).getDouble(4)))
    byT.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq(pLo, pHi) => assert(pHi <= pLo + 1e-12)
      case _ =>
    }
  }

  test("q158 glmConfInt: Wald intervals + odds ratios cohere with glmInference") {
    import spark.implicits._
    val data = (0 until 400).map { i =>
      val w = (5 + i % 20).toDouble
      val x1 = ((i * 7) % 23).toDouble / 23.0 * 4.0 - 2.0
      val x2 = ((i * 13) % 17).toDouble / 17.0 * 2.0 - 1.0
      val mu = 1.0 / (1.0 + math.exp(-(-0.4 + 0.8 * x1 - 0.6 * x2)))
      val y = math.min(0.98, math.max(0.02, mu + 0.15 * math.sin(i * 1.7)))
      (w, x1, x2, y)
    }.toDF("w", "x1", "x2", "y")
    val inf = Regression.glmInference(data, iters = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ci = Regression.glmConfInt(data, iters = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    val z = 1.959963985
    Seq("intercept", "x1", "x2").foreach { term =>
      val (est, se) = inf(term)
      val r = ci(term)
      assert(math.abs(r.getDouble(1) - est) < 1e-9, s"$term estimate")
      // recompute from ROUND-6 inference outputs: agreement to the
      // rounding grid (the exact-chain parity is the oracle's job)
      assert(math.abs(r.getDouble(2) - (est - z * se)) < 1e-5, s"$term conf_low")
      assert(math.abs(r.getDouble(3) - (est + z * se)) < 1e-5, s"$term conf_high")
      assert(math.abs(r.getDouble(4) - math.exp(est)) < 1e-5 * (1.0 + math.exp(est)),
        s"$term odds_ratio")
      // interval geometry: bounds bracket the point on both scales
      assert(r.getDouble(2) < r.getDouble(1) && r.getDouble(1) < r.getDouble(3))
      assert(r.getDouble(5) < r.getDouble(4) && r.getDouble(4) < r.getDouble(6))
      // exp is monotone: or bounds are the transformed linear bounds
      assert(math.abs(r.getDouble(5) - math.exp(r.getDouble(2))) <
        1e-4 * (1.0 + math.exp(r.getDouble(2))), s"$term or_low")
      assert(math.abs(r.getDouble(6) - math.exp(r.getDouble(3))) <
        1e-4 * (1.0 + math.exp(r.getDouble(3))), s"$term or_high")
    }
  }

  test("q95 glmQuasibinomialBy recovers a DIFFERENT planted GLM per group") {
    import spark.implicits._
    // noise-free logistic data: group g has β = (-0.2·g, 0.5+0.3·g,
    // -0.4). y = μ exactly, so each group's IRLS must converge to ITS
    // OWN β and the dispersion/SEs must collapse to ~0. A 'flat' group
    // with constant covariates must yield NULLs, not garbage.
    val rows = (0 until 2).flatMap { g =>
      (0 until 150).map { i =>
        val w = (3 + i % 5).toDouble
        val x1 = ((i * 7) % 23).toDouble / 23.0 * 4.0 - 2.0
        val x2 = ((i * 13) % 17).toDouble / 17.0 * 2.0 - 1.0
        val mu = 1.0 / (1.0 + math.exp(-(-0.2 * g + (0.5 + 0.3 * g) * x1 - 0.4 * x2)))
        (g.toLong, w, x1, x2, mu)
      }
    } ++ (0 until 10).map(i => (9L, 1.0, 2.0, 3.0, 0.5))
    val fits = Regression.glmQuasibinomialBy(
        rows.toDF("g", "w", "x1", "x2", "y"), Seq("g"), iters = 6)
      .collect().map(r => r.getLong(0) -> r).toMap
    def d(r: org.apache.spark.sql.Row, c: String): Double = r.getDouble(r.fieldIndex(c))
    (0L to 1L).foreach { g =>
      val r = fits(g)
      assert(math.abs(d(r, "b_intercept") - (-0.2 * g)) < 1e-3, s"g=$g b0")
      assert(math.abs(d(r, "b_x1") - (0.5 + 0.3 * g)) < 1e-3, s"g=$g b1")
      assert(math.abs(d(r, "b_x2") - (-0.4)) < 1e-3, s"g=$g b2")
      assert(d(r, "dispersion") < 1e-3, s"g=$g dispersion") // exact data
      assert(d(r, "se_intercept") < 1e-2, s"g=$g se0")
      // a fully saturated fit has zero SE — its t must be NULL, not a
      // divide-by-zero or an Infinity
      if (d(r, "se_intercept") == 0.0)
        assert(r.isNullAt(r.fieldIndex("t_intercept")), s"g=$g t on zero SE")
    }
    val dead = fits(9L)
    assert(dead.isNullAt(dead.fieldIndex("b_intercept"))
      && dead.isNullAt(dead.fieldIndex("se_intercept"))
      && dead.isNullAt(dead.fieldIndex("t_intercept")), "degenerate group must be NULL")
    assert(dead.getLong(1) == 10) // but its row count is still real
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
