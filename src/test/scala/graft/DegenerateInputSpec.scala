package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators._

/** Degenerate-input sweep over the generic (DataFrame-in) APIs: empty
  * frames, constant columns, one-class labels. Under ANSI mode (Spark 4
  * default) an exact-zero denominator is a RUNTIME ERROR, not an
  * Infinity — so every statistic that is mathematically undefined on a
  * degenerate input must come back NULL by construction, never throw.
  * (The q94/q95 round found this class twice: CASE guards do not
  * protect a division Catalyst's subexpression elimination decides to
  * hoist.) */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  import spark.implicits._

  private def emptyDF = Seq.empty[(String, Long, Double)].toDF("s", "k", "x")

  test("chiSquare: constant column (dof 0) yields NULL cramers_v, not a throw") {
    val df = (1 to 40).map(i => ("only", i % 5)).toDF("a", "b")
    val r = Independence.chiSquare(df, "a", "b").head()
    assert(r.getLong(r.fieldIndex("n_a")) == 1)
    assert(r.getLong(r.fieldIndex("dof")) == 0)
    assert(r.isNullAt(r.fieldIndex("cramers_v")), "V undefined at dof 0")
  }

  test("chiSquare: empty input survives") {
    val r = Independence.chiSquare(emptyDF, "s", "k").collect()
    assert(r.length == 1) // one all-NULL/zero summary row, no exception
  }

  test("aucMicro: one-class and empty inputs yield NULL auc") {
    val oneClass = (1 to 20).map(i => (i.toDouble, 1)).toDF("score", "y")
    val r1 = Eval.aucMicro(oneClass, "score", "y").head()
    assert(r1.isNullAt(r1.fieldIndex("auc_micro")))
    val r2 = Eval.aucMicro(emptyDF.selectExpr("x AS score", "k AS y"), "score", "y").head()
    assert(r2.isNullAt(r2.fieldIndex("auc_micro")))
  }

  test("keySkew: empty input yields NULL shares, not integer div-by-zero") {
    val r = Monitor.keySkew(emptyDF, "k").head()
    assert(r.isNullAt(r.fieldIndex("top_share_ppm")))
    assert(r.isNullAt(r.fieldIndex("p_singleton_ppm")))
  }

  test("kAnonymity: empty input yields an empty report") {
    assert(Monitor.kAnonymity(emptyDF, Seq("s")).collect().isEmpty)
  }

  test("cdfTable: empty input yields an empty table; single value covers full range") {
    assert(QuantileTransform.cdfTable(emptyDF, "k").collect().isEmpty)
    val one = Seq((7L, 7L), (7L, 7L)).toDF("k", "k2")
    val r = QuantileTransform.cdfTable(one, "k").collect()
    assert(r.length == 1 && r.head.getLong(r.head.fieldIndex("n_rows")) == 2)
  }

  test("corrMatrix: zero-variance column yields NULL correlations, not a throw") {
    // integer-snapped sums make a constant column's variance EXACTLY 0
    val df = (1 to 30).map(i =>
      (5.0, (i % 7).toDouble / 10.0, (i % 3).toDouble / 100.0))
      .toDF("l_quantity", "l_discount", "l_tax")
    val rows = Correlation.corrMatrix(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val qd = rows(("quantity", "discount"))
    assert(qd.isNullAt(qd.fieldIndex("pearson_r")), "r undefined vs a constant")
    val dt = rows(("discount", "tax"))
    assert(!dt.isNullAt(dt.fieldIndex("pearson_r")), "well-posed pair intact")
  }

  test("wlsFitBy: empty input yields an empty frame; glmQuasibinomialBy too") {
    val e = Seq.empty[(Long, Double, Double, Double, Double)]
      .toDF("g", "w", "x1", "x2", "y")
    assert(Regression.wlsFitBy(e, Seq("g")).collect().isEmpty)
    assert(Regression.glmQuasibinomialBy(e, Seq("g"), iters = 2).collect().isEmpty)
  }
}
