package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Tost

/** TOST equivalence (q195): hand-computed two one-sided t's, the
  * proven-equivalent / proven-different / INCONCLUSIVE trichotomy
  * (absence of evidence ≠ equivalence — the property the operator
  * exists for), and margin sensitivity. Value-level oracle
  * equivalence runs through graft.Verify. */
class TostSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def tost(a: Seq[Long], b: Seq[Long], delta: Long) = {
    import spark.implicits._
    Tost.tost((a.map(v => ("G", "A", v)) ++ b.map(v => ("G", "B", v)))
      .toDF("g", "cls", "v").repartition(3), "A", "B", delta)
      .collect().head
  }

  private val A = Seq(0L, 0L, 20L, 20L)
  private val B = Seq(10L, 10L, 30L, 30L)

  test("hand case: diff = −10, se = √(200/3), margin 30 → equivalent") {
    val r = tost(A, B, 30L)
    assert(r.getDouble(r.fieldIndex("diff")) == -10.0)
    assert(math.abs(r.getDouble(r.fieldIndex("se"))
      - math.sqrt(200.0 / 3.0)) < 1e-3)
    assert(r.getDouble(r.fieldIndex("t_lower")) == 2.4495)
    assert(r.getDouble(r.fieldIndex("t_upper")) == 4.899)
    assert(r.getDouble(r.fieldIndex("p_equiv")) < 0.05)
    assert(r.getLong(r.fieldIndex("equivalent")) == 1L)
  }

  test("a tight margin flips the verdict on the same data") {
    val r = tost(A, B, 12L)
    assert(r.getDouble(r.fieldIndex("p_equiv")) > 0.05)
    assert(r.getLong(r.fieldIndex("equivalent")) == 0L)
  }

  test("zero difference but huge noise: INCONCLUSIVE, not equivalent") {
    // means equal, variance enormous relative to the margin
    val r = tost(Seq(0L, 10000L), Seq(0L, 10000L), 100L)
    assert(r.getDouble(r.fieldIndex("diff")) == 0.0)
    assert(r.getLong(r.fieldIndex("equivalent")) == 0L)
  }

  test("a real difference beyond the margin is firmly non-equivalent") {
    // diff = −100 with margin 10: the LOWER one-sided test can't reject
    val r = tost(Seq(0L, 0L, 2L, 2L), Seq(100L, 100L, 102L, 102L), 10L)
    assert(r.getDouble(r.fieldIndex("t_lower")) < 0.0)
    assert(r.getDouble(r.fieldIndex("p_equiv")) > 0.5)
    assert(r.getLong(r.fieldIndex("equivalent")) == 0L)
  }

  test("the margin ships with the verdict") {
    val r = tost(A, B, 30L)
    assert(r.getLong(r.fieldIndex("delta_margin")) == 30L)
  }
}
