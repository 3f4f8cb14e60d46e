package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Overdispersion

/** Poisson overdispersion test (q189): hand-computed dispersion index,
  * the constant-count underdispersion floor, the zero-period
  * sensitivity that motivates the dense spine, degenerate NULLs, and
  * the registered query's spine density. Value-level oracle
  * equivalence runs through graft.Verify. */
class OverdispersionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def d(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Overdispersion.dispersionTest(rows.toDF("g", "c").repartition(3))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("hand case {0, 2}: D = 2, z = √½") {
    val r = d(Seq(("A", 0L), ("A", 2L)))("A")
    assert(r.getDouble(r.fieldIndex("dispersion")) == 2.0)
    assert(r.getDouble(r.fieldIndex("z")) == 0.7071)
  }

  test("constant counts: D = 0 (maximal underdispersion)") {
    val r = d(Seq.fill(10)(("A", 5L)))("A")
    assert(r.getDouble(r.fieldIndex("dispersion")) == 0.0)
    assert(r.getDouble(r.fieldIndex("z")) < 0.0)
  }

  test("dropping zero periods lies: {4,4} reads regular, {4,4,0} does not") {
    val sparse = d(Seq(("A", 4L), ("A", 4L)))("A")
    val dense = d(Seq(("A", 4L), ("A", 4L), ("A", 0L)))("A")
    assert(sparse.getDouble(sparse.fieldIndex("dispersion")) == 0.0)
    assert(dense.getDouble(dense.fieldIndex("dispersion")) > 1.0)
  }

  test("no events at all: D NULL via nullif") {
    val r = d(Seq(("A", 0L), ("A", 0L)))("A")
    assert(r.isNullAt(r.fieldIndex("dispersion")))
  }

  test("single period: n < 2 → NULL") {
    val r = d(Seq(("A", 7L)))("A")
    assert(r.isNullAt(r.fieldIndex("dispersion")))
  }

  test("registered query fills the calendar: every priority spans the same spine") {
    val rows = Overdispersion
      .dailyOrderDispersion(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    val spans = rows.map(_.getLong(1)).distinct // n_periods
    assert(spans.length == 1, s"all priorities share one dense spine: $spans")
  }
}
