package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Eval

/** Exact-AUC invariants vs a naive pairwise reference. Value-level
  * oracle equivalence runs through graft.Verify. */
class EvalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** Naive pairwise AUC in micro units: wins + half-ties over pairs. */
  private def refAuc(rows: Seq[(Long, Int)]): Long = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    num * 1000000L / (2L * pos.size * neg.size)
  }

  private def run(rows: Seq[(Long, Int)]): (Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = Eval.aucMicro(rows.toDF("s", "y"), "s", "y").head
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))
  }

  test("perfect separation is 1.0; reversed is 0.0; all-tied is 0.5") {
    assert(run(Seq((10L, 1), (9L, 1), (2L, 0), (1L, 0))) == ((2L, 2L, Some(1000000L))))
    assert(run(Seq((1L, 1), (2L, 1), (9L, 0), (10L, 0))) == ((2L, 2L, Some(0L))))
    assert(run(Seq((5L, 1), (5L, 0), (5L, 1), (5L, 0))) == ((2L, 2L, Some(500000L))))
  }

  test("tie-corrected rank sums equal the naive pairwise count on mixed data") {
    val rows = Seq(
      (3L, 1), (3L, 0), (7L, 1), (1L, 0), (9L, 1), (9L, 0), (2L, 0),
      (5L, 1), (5L, 0), (5L, 1), (8L, 0), (0L, 1))
    val (np, nn, auc) = run(rows)
    assert(np == rows.count(_._2 == 1) && nn == rows.count(_._2 == 0))
    assert(auc.contains(refAuc(rows)))
  }

  test("NULL scores and labels are excluded, not ranked") {
    import spark.implicits._
    val rows = Seq[(java.lang.Long, java.lang.Integer)](
      (10L, 1), (9L, 1), (2L, 0), (1L, 0), (null, 0), (5L, null))
    val r = Eval.aucMicro(rows.toDF("s", "y"), "s", "y").head
    // identical to the 4-row clean input: perfect separation
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 1000000L)))
  }

  test("single-class input yields NULL AUC, not a crash or a fake 0.5") {
    assert(run(Seq((1L, 1), (2L, 1)))._3.isEmpty)
    assert(run(Seq((1L, 0), (2L, 0)))._3.isEmpty)
  }

  test("q83 over testdata: AUC defined and in [0, 1e6]; classes populated") {
    val (np, nn, auc) = {
      val r = Eval.qualityAuc(spark, "/root/testdata/sf0.001").head
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    assert(np > 0 && nn > 0)
    assert(auc.exists(a => a >= 0L && a <= 1000000L))
  }
}
