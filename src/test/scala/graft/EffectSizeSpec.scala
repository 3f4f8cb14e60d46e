package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.EffectSize

/** Cohen's d / Hedges' g (q225): the exact textbook hand case with
  * the J correction, sign symmetry, zero-variance and short-side
  * NULLs. Value-level oracle equivalence runs through graft.Verify. */
class EffectSizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def es(rows: Seq[(Int, String, Double)]) = {
    import spark.implicits._
    EffectSize.effectSize(
      rows.toDF("g", "cls", "v").repartition(4), "g", "cls", "A", "B", "v",
      scale = "1e0")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("textbook hand case: d = −4/√2, g = d·4/7") {
    // A = {0,2} (mean 1, s² 2), B = {4,6} (mean 5, s² 2):
    // s_p = √2, d = −2.828427; J = 1 − 3/(16−9) = 4/7 → g = −1.616244
    val r = es(Seq((1, "A", 0.0), (1, "A", 2.0),
      (1, "B", 4.0), (1, "B", 6.0)))(1)
    assert(d(r, "cohens_d") == -2.828427)
    assert(d(r, "hedges_g") == -1.616244)
    assert(r.getString(r.fieldIndex("magnitude")) == "large")
  }

  test("swapping the classes negates d exactly") {
    val a = es(Seq((1, "A", 0.0), (1, "A", 2.0), (1, "B", 4.0), (1, "B", 6.0)))(1)
    val b = es(Seq((1, "B", 0.0), (1, "B", 2.0), (1, "A", 4.0), (1, "A", 6.0)))(1)
    assert(d(a, "cohens_d") == -d(b, "cohens_d"))
  }

  test("identical distributions read d = 0, negligible") {
    val r = es(Seq((1, "A", 1.0), (1, "A", 3.0), (1, "B", 1.0), (1, "B", 3.0)))(1)
    assert(d(r, "cohens_d") == 0.0)
    assert(r.getString(r.fieldIndex("magnitude")) == "negligible")
  }

  test("zero pooled variance and n < 2 guard to NULL") {
    val flat = es(Seq((1, "A", 5.0), (1, "A", 5.0), (1, "B", 5.0), (1, "B", 5.0)))(1)
    assert(flat.isNullAt(flat.fieldIndex("cohens_d")))
    val short = es(Seq((1, "A", 1.0), (1, "B", 2.0), (1, "B", 4.0)))(1)
    assert(short.isNullAt(short.fieldIndex("cohens_d")))
  }
}
