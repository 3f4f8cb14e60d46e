package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.JarqueBera

/** Jarque–Bera normality test (q180): exact symmetric-case zero skew,
  * the Bernoulli closed-form moments under a fractional pivot offset,
  * small-n NULL, and group independence. Value-level oracle
  * equivalence runs through graft.Verify. */
class JarqueBeraSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def jb(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    JarqueBera.jarqueBera(rows.toDF("g", "x").repartition(3))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("symmetric values: skew = 0 exactly, platykurtic, JB = 1/6") {
    // (0, 10, 10, 20): mean 10 (exact pivot), m2 = 50, m3 = 0,
    // m4 = 5000 → kurt = 5000/2500 − 3 = −1, JB = 4/6·(0 + 1/4)
    val r = jb(Seq(("A", 0L), ("A", 10L), ("A", 10L), ("A", 20L)))("A")
    assert(r.getLong(r.fieldIndex("n")) == 4L)
    assert(r.getDouble(r.fieldIndex("skewness")) == 0.0)
    assert(r.getDouble(r.fieldIndex("kurtosis_excess")) == -1.0)
    assert(r.getDouble(r.fieldIndex("jb")) == 0.1667)
    assert(math.abs(r.getDouble(r.fieldIndex("p_value")) -
      math.exp(-1.0 / 12.0)) < 2e-4)
  }

  test("Bernoulli(1/4) closed forms survive the fractional pivot") {
    // (0,0,0,1): pivot c = 0, δ = 1/4 — skew = (1−2p)/√(pq) = 1.1547,
    // excess kurt = (1−6pq)/(pq) = −2/3
    val r = jb(Seq(("A", 0L), ("A", 0L), ("A", 0L), ("A", 1L)))("A")
    assert(math.abs(r.getDouble(r.fieldIndex("skewness")) - 1.154701) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("kurtosis_excess")) -
      (-0.666667)) < 1e-6)
  }

  test("large values: pivot centering keeps the sums exact") {
    // same shape as the symmetric case shifted by 1e9 — identical stats
    val base = Seq(("A", 0L), ("A", 10L), ("A", 10L), ("A", 20L))
    val shifted = base.map { case (g, x) => (g, x + 1000000000L) }
    val (r1, r2) = (jb(base)("A"), jb(shifted)("A"))
    assert(r1.getDouble(r1.fieldIndex("jb")) ==
      r2.getDouble(r2.fieldIndex("jb")))
    assert(r1.getDouble(r1.fieldIndex("skewness")) ==
      r2.getDouble(r2.fieldIndex("skewness")))
  }

  test("n < 4 → NULL shape statistics") {
    val r = jb(Seq(("A", 1L), ("A", 2L), ("A", 3L)))("A")
    assert(r.isNullAt(r.fieldIndex("skewness")))
    assert(r.isNullAt(r.fieldIndex("jb")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("constant values: m2 = 0 → NULL, not a division blowup") {
    val r = jb(Seq.fill(6)(("A", 7L)))("A")
    assert(r.isNullAt(r.fieldIndex("skewness")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("groups are independent") {
    val solo = jb(Seq(("A", 0L), ("A", 10L), ("A", 10L), ("A", 20L)))("A")
    val joint = jb(Seq(("A", 0L), ("A", 10L), ("A", 10L), ("A", 20L),
      ("B", 5L), ("B", 6L), ("B", 7L), ("B", 8L), ("B", 100L)))
    assert(joint("A").getDouble(solo.fieldIndex("jb")) ==
      solo.getDouble(solo.fieldIndex("jb")))
    assert(joint("B").getDouble(solo.fieldIndex("skewness")) > 1.0)
  }
}
