package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Periodogram

/** Periodogram (q228): a pure sinusoid reads exactly 1 at its period
  * and 0 off-period, phase invariance through the sin term, constant
  * NULL, group isolation. Value-level oracle equivalence runs through
  * graft.Verify. */
class PeriodogramSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def pg(rows: Seq[(Int, Long, Long)], periods: Seq[Int]) = {
    import spark.implicits._
    Periodogram.periodogram(rows.toDF("g", "t", "x").repartition(4), periods)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
  }

  private val wave = (0L to 7L).map(t =>
    (1, t, Seq(10L, 0L, -10L, 0L)(t.toInt % 4)))

  test("a pure period-4 cosine concentrates ALL variance at p = 4") {
    val m = pg(wave, Seq(4, 2))
    assert(m((1, 4)).getDouble(3) == 1.0)
    assert(m((1, 2)).getDouble(3) == 0.0)
  }

  test("a quarter-phase shift moves power to the sin term, frac stays 1") {
    val shifted = (0L to 7L).map(t =>
      (1, t, Seq(0L, 10L, 0L, -10L)(t.toInt % 4)))
    val m = pg(shifted, Seq(4))
    assert(m((1, 4)).getDouble(3) == 1.0)
  }

  test("a constant series has no variance to allocate: NULL") {
    val m = pg((0L to 7L).map(t => (1, t, 5L)), Seq(4))
    assert(m((1, 4)).isNullAt(3))
  }

  test("groups read independently") {
    val m = pg(wave ++ (0L to 7L).map(t => (2, t, 5L)), Seq(4))
    assert(m((1, 4)).getDouble(3) == 1.0)
    assert(m((2, 4)).isNullAt(3))
  }
}
