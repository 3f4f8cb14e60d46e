package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.PChart

/** p-chart (q293): a planted defect-burst day is caught at the right
  * day, thin-day limit widening, degenerate-rate guard, and the
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class PChartSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** rows: (day, nTotal, nDefect). */
  private def chart(days: Seq[(Long, Int, Int)]) = {
    import spark.implicits._
    val rows = days.flatMap { case (d, n, x) =>
      (0 until n).map(i => ("g", d, if (i < x) 1 else 0))
    }
    PChart.pChart(rows.toDF("g", "d", "defect").repartition(4))
      .collect().head
  }

  test("a burst day is out of bounds and is the worst day") {
    // stable 10% rate on 100-wide days; day 7 bursts to 50%
    val days = (0L until 20L).map(d =>
      (d, 100, if (d == 7) 50 else 10))
    val r = chart(days)
    assert(r.getLong(r.fieldIndex("worst_day")) == 7L)
    assert(r.getLong(r.fieldIndex("n_oob")) >= 1L)
    assert(r.getDouble(r.fieldIndex("worst_absz")) > 3.0)
  }

  test("thin days get wide limits: the same deviation passes on a small n") {
    // p̄ ≈ 10%; a 3-defect day of n=10 (30%) is within its own band
    // (z = 0.2/√(0.09·0.9/10)... wait p̄(1-p̄)=0.09 → σ=0.095 → z≈2.1 < 3)
    val days = (0L until 30L).map(d => (d, 100, 10)) :+ ((30L, 10, 3))
    val r = chart(days)
    assert(r.getLong(r.fieldIndex("n_oob")) == 0L)
  }

  test("zero-defect chart: degenerate rate reports NULL z columns") {
    val r = chart((0L until 10L).map(d => (d, 50, 0)))
    assert(r.getLong(r.fieldIndex("pbar_ppm")) == 0L)
    assert(r.isNullAt(r.fieldIndex("worst_absz")))
  }

  test("pbar_ppm is the exact pooled rate") {
    val r = chart(Seq((0L, 100, 10), (1L, 300, 15)))
    // 25/400 = 62500 ppm
    assert(r.getLong(r.fieldIndex("pbar_ppm")) == 62500L)
    assert(r.getLong(r.fieldIndex("n_days")) == 2L)
  }

  test("registered shape: one row per priority") {
    val df = PChart.orderStatusPChart(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("o_orderpriority", "n_days", "pbar_ppm",
      "n_oob", "worst_day", "worst_absz"))
    assert(rows.length == 5)
  }
}
