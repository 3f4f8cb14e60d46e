package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.CrossVal

/** K-fold CV (q242): exact recovery on a noiseless plant, parity with
  * a brute-force per-fold refit (the leave-fold-out arithmetic is the
  * thing under test), fold accounting, degenerate NULLs, and the
  * registered query. Value-level oracle equivalence runs through
  * graft.Verify. */
class CrossValSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def frame(rows: Seq[(String, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("key", "x", "y")
  }

  test("noiseless line: every fold recovers it exactly, rmse 0") {
    val rows = (1 to 200).map(i => (s"k$i", i.toDouble % 37, 1.0 + 2.0 * (i % 37)))
    val got = CrossVal.kfold(frame(rows)).collect()
    assert(got.length == CrossVal.Folds)
    got.foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("b0")) - 1.0) < 1e-4)
      assert(math.abs(r.getDouble(r.fieldIndex("b1")) - 2.0) < 1e-4)
      assert(r.getDouble(r.fieldIndex("rmse")) < 1e-3)
    }
    val (tr, te) = (got.map(_.getLong(1)), got.map(_.getLong(2)))
    val total = te.sum
    assert(total == 200L)
    got.foreach(r => assert(r.getLong(1) + r.getLong(2) == total))
  }

  test("leave-fold-out parity with a brute-force per-fold refit") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map { i =>
      val x = rnd.nextInt(50).toDouble
      (s"row$i", x, 3.0 + 0.5 * x + rnd.nextGaussian())
    }
    val got = CrossVal.kfold(frame(rows)).collect()
      .map(r => r.getLong(0) -> r).toMap
    // brute reference: recompute fold assignment + per-fold OLS on the
    // SAME micro-floored sufficient statistics
    val assigned = frame(rows).selectExpr(
      s"hash48(concat('cv:', key)) % ${CrossVal.Folds} AS fold", "x", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    (0L until CrossVal.Folds.toLong).foreach { f =>
      val train = assigned.filter(_._1 != f)
      def fs(t: (Long, Double, Double) => Double): Double =
        train.map { case (g, x, y) =>
          math.floor(t(g, x, y) * 1e6) }.sum / 1e6
      val (sw, sx, sxx) = (train.length.toDouble,
        fs((_, x, _) => x), fs((_, x, _) => x * x))
      val (sy, sxy) = (fs((_, _, y) => y), fs((_, x, y) => x * y))
      val det = sw * sxx - sx * sx
      val b0 = (sxx * sy - sx * sxy) / det
      val b1 = (sw * sxy - sx * sy) / det
      val r = got(f)
      assert(math.abs(r.getDouble(r.fieldIndex("b0")) - b0) < 1e-5, s"fold $f b0")
      assert(math.abs(r.getDouble(r.fieldIndex("b1")) - b1) < 1e-5, s"fold $f b1")
      assert(r.getLong(r.fieldIndex("n_train")) == train.length.toLong)
    }
  }

  test("degenerate: constant x in training yields NULLs, not garbage") {
    val rows = (1 to 60).map(i => (s"k$i", 7.0, i.toDouble))
    val got = CrossVal.kfold(frame(rows)).collect()
    got.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("b0")))
      assert(r.isNullAt(r.fieldIndex("rmse")))
    }
  }

  test("registered q242 at sf0.001: 5 folds, consistent positive slopes") {
    val rows = CrossVal.lineRevenueCv(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == CrossVal.Folds)
    // the synthetic testdata prices are INDEPENDENT of quantity
    // (pooled OLS slope ≈ −0.02, r ≈ −0.01 — checked in DuckDB), so
    // the informative assertion is fold AGREEMENT, not sign: every
    // fold's model sees ~4/5 of the same data
    val slopes = rows.map(r => r.getDouble(r.fieldIndex("b1")))
    assert(slopes.max - slopes.min < 0.05,
      s"fold slopes too dispersed: ${slopes.toSeq}")
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("rmse")) > 0.0))
  }
}
