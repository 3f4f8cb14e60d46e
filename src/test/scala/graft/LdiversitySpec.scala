package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Ldiversity

/** l-diversity (q278): homogeneity attack detection, the uniform and
  * skewed entropy endpoints, and the registered shape. Value-level
  * oracle equivalence runs through graft.Verify. */
class LdiversitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def audit(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Ldiversity.lDiversity(
      rows.toDF("qid", "sv").repartition(4), Seq("qid"), "sv")
      .collect()
      .map(r => r.getLong(r.fieldIndex("l_distinct")) -> r).toMap
  }

  test("homogeneous class: l = 1, entropy_l exactly 1") {
    val m = audit(Seq.fill(10)(("a", 7L)))
    val r = m(1L)
    assert(r.getLong(r.fieldIndex("n_rows")) == 10L)
    assert(r.getDouble(r.fieldIndex("min_entropy_l")) == 1.0)
    assert(r.getLong(r.fieldIndex("avg_entropy_micro")) == 1000000L)
  }

  test("uniform class over 4 values: entropy_l = l = 4") {
    val m = audit((0 until 20).map(i => ("a", (i % 4).toLong)))
    val r = m(4L)
    assert(math.abs(r.getDouble(r.fieldIndex("min_entropy_l")) - 4.0) < 1e-4)
  }

  test("skewed class: l_distinct = 2 but entropy_l near 1 (homogeneity attack)") {
    // 99 of one value, 1 of another: distinct-l says 2, entropy says ~1.06
    val m = audit(Seq.fill(99)(("a", 0L)) ++ Seq(("a", 1L)))
    val r = m(2L)
    val el = r.getDouble(r.fieldIndex("min_entropy_l"))
    assert(el > 1.0 && el < 1.1)
  }

  test("classes with equal l are banded together; min is the worst class") {
    // two l=2 classes: one uniform (entropy_l = 2), one 9:1 skewed
    val rows = (0 until 10).map(i => ("u", (i % 2).toLong)) ++
      (Seq.fill(9)(("s", 0L)) :+ ("s", 1L))
    val m = audit(rows)
    val r = m(2L)
    assert(r.getLong(r.fieldIndex("n_groups")) == 2L)
    assert(r.getLong(r.fieldIndex("n_rows")) == 20L)
    val skewedEl = math.exp(-(0.9 * math.log(0.9) + 0.1 * math.log(0.1)))
    assert(math.abs(r.getDouble(r.fieldIndex("min_entropy_l")) - skewedEl) < 1e-4)
  }

  test("registered shape over customer quasi-ids") {
    val df = Ldiversity.customerLdiversity(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("l_distinct", "n_groups", "n_rows",
      "min_entropy_l", "avg_entropy_micro"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // bands partition the class set: every class has l ≥ 1
    assert(rows.forall(_.getLong(0) >= 1L))
  }
}
