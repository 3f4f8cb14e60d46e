package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.FisherExact

/** Fisher's exact test (q282): textbook tables against R's
  * fisher.test values, degenerate margins, the odds ratio, and the
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class FisherExactSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** Build the (x, y) row frame for a 2×2 table [[a, b], [c, d]]
    * where rows are x (1/0) and columns are y (1/0). */
  private def fisher(a: Int, b: Int, c: Int, d: Int) = {
    import spark.implicits._
    val rows =
      Seq.fill(a)((1, 1)) ++ Seq.fill(b)((1, 0)) ++
        Seq.fill(c)((0, 1)) ++ Seq.fill(d)((0, 0))
    FisherExact.fisherExact(rows.toDF("x", "y").repartition(4))
      .collect().head
  }

  test("tea-tasting table [[3,1],[1,3]]: p = 0.4857 (R fisher.test)") {
    val r = fisher(3, 1, 1, 3)
    assert(math.abs(r.getDouble(r.fieldIndex("p_fisher")) - 0.485714) < 1e-4)
    assert(r.getDouble(r.fieldIndex("or_sample")) == 9.0)
  }

  test("strong association [[10,0],[0,10]]: p = 2·1/C(20,10)") {
    val r = fisher(10, 0, 0, 10)
    // both extreme tables are included: p = 2/184756 ≈ 1.0825e-5
    assert(math.abs(r.getDouble(r.fieldIndex("p_fisher")) - 2.0 / 184756) < 1e-6)
  }

  test("independent-ish table [[4,6],[5,5]]: p = 1 (most balanced obs)") {
    // R: fisher.test(matrix(c(4,6,5,5),2,2)) → p = 1
    val r = fisher(4, 6, 5, 5)
    assert(r.getDouble(r.fieldIndex("p_fisher")) == 1.0)
  }

  test("R cross-check [[1,9],[11,3]]: p = 0.002759") {
    val r = fisher(1, 9, 11, 3)
    assert(math.abs(r.getDouble(r.fieldIndex("p_fisher")) - 0.002759) < 1e-4)
  }

  test("degenerate margin (no y=1 at all): single table, p = 1") {
    val r = fisher(0, 5, 0, 7)
    assert(r.getDouble(r.fieldIndex("p_fisher")) == 1.0)
    assert(r.getLong(r.fieldIndex("a_obs")) == 0L)
  }

  test("zero cross cell: odds ratio NULL (division by zero guarded)") {
    val r = fisher(5, 0, 3, 4)
    // b = 0 → denominator (r1-a)*(c1-a) = 0·3 = 0... a=5, r1=5, c1=8:
    // (r1-a)=0 → OR undefined
    assert(r.isNullAt(r.fieldIndex("or_sample")))
  }

  test("registered shape: one row, cohort-grade counts") {
    val df = FisherExact.nationBalanceFisher(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("n_total", "r1", "c1", "a_obs", "or_sample", "p_fisher"))
    val r = df.collect().head
    assert(r.getLong(r.fieldIndex("n_total")) > 0L)
    val p = r.getDouble(r.fieldIndex("p_fisher"))
    assert(p > 0.0 && p <= 1.0)
  }
}
