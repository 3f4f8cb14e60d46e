package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Confusion

/** Confusion metrics (q213): exact hand-counted cells and rates,
  * perfect / degenerate classifiers, NULL-row exclusion. Value-level
  * oracle equivalence runs through graft.Verify. */
class ConfusionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def conf(rows: Seq[(Integer, Integer)]) = {
    import spark.implicits._
    Confusion.confusion(rows.toDF("p", "y").repartition(4), "p", "y")
      .collect().head
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("hand case: tp=3 fp=1 fn=2 tn=4 and every derived rate") {
    val rows = Seq.fill(3)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(2)((0, 1)) ++ Seq.fill(4)((0, 0))
    val r = conf(rows.map { case (a, b) =>
      (Integer.valueOf(a), Integer.valueOf(b)) })
    assert(r.getLong(r.fieldIndex("tp")) == 3L)
    assert(r.getLong(r.fieldIndex("fp")) == 1L)
    assert(r.getLong(r.fieldIndex("fn")) == 2L)
    assert(r.getLong(r.fieldIndex("tn")) == 4L)
    assert(d(r, "precision") == 0.75)
    assert(d(r, "recall") == 0.6)
    assert(d(r, "f1") == 0.666667)        // 6/9 round-6
    assert(d(r, "accuracy") == 0.7)
    assert(d(r, "fpr") == 0.2)
    assert(d(r, "mcc") == 0.408248)       // 10/√600
  }

  test("perfect classifier: f1 = accuracy = mcc = 1") {
    val r = conf(Seq((1, 1), (1, 1), (0, 0)).map { case (a, b) =>
      (Integer.valueOf(a), Integer.valueOf(b)) })
    assert(d(r, "f1") == 1.0)
    assert(d(r, "accuracy") == 1.0)
    assert(d(r, "mcc") == 1.0)
    assert(d(r, "fpr") == 0.0)
  }

  test("never-fires classifier: precision and mcc are NULL, recall 0") {
    val r = conf(Seq((0, 1), (0, 1), (0, 0)).map { case (a, b) =>
      (Integer.valueOf(a), Integer.valueOf(b)) })
    assert(r.isNullAt(r.fieldIndex("precision")))
    assert(r.isNullAt(r.fieldIndex("mcc")))    // a zero marginal
    assert(d(r, "recall") == 0.0)
  }

  test("NULL rows are excluded up front") {
    val r = conf(Seq((Integer.valueOf(1), Integer.valueOf(1)),
      (null.asInstanceOf[Integer], Integer.valueOf(1)),
      (Integer.valueOf(0), null.asInstanceOf[Integer]),
      (Integer.valueOf(0), Integer.valueOf(0))))
    assert(r.getLong(r.fieldIndex("tp")) == 1L)
    assert(r.getLong(r.fieldIndex("tn")) == 1L)
    assert(d(r, "accuracy") == 1.0)
  }
}
