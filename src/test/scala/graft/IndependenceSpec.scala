package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Independence

/** Chi-square invariants vs a naive driver recompute. Value-level
  * oracle equivalence runs through graft.Verify. */
class IndependenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def run(rows: Seq[(String, String)]): (Long, Long, Long, Long, Long, Double) = {
    import spark.implicits._
    val r = Independence.chiSquare(rows.toDF("a", "b"), "a", "b").head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5))
  }

  test("perfectly dependent columns: chi2 = n*min(r-1,c-1), V = 1") {
    // b is a function of a (2x2, balanced): chi2 = n, V = 1
    val rows = Seq.fill(10)(("x", "1")) ++ Seq.fill(10)(("y", "2"))
    val (n, na, nb, dof, chi2, v) = run(rows)
    assert((n, na, nb, dof) == ((20L, 2L, 2L, 1L)))
    assert(chi2 == 20L * 1000000L)
    assert(v == 1.0)
  }

  test("independent product distribution: chi2 = 0 exactly") {
    // counts factor perfectly: O(a,b) = rowShare*colShare*n for all cells
    val rows = for {
      (a, ka) <- Seq(("x", 1), ("y", 3))
      (b, kb) <- Seq(("1", 2), ("2", 5))
      _ <- 1 to ka * kb
    } yield (a, b)
    val (_, _, _, _, chi2, v) = run(rows)
    assert(chi2 == 0L && v == 0.0)
  }

  test("zero cells contribute their expected mass (naive recompute parity)") {
    val rows = Seq.fill(6)(("x", "1")) ++ Seq.fill(3)(("y", "2")) ++
      Seq.fill(2)(("x", "2")) // cell (y,1) is EMPTY but expected > 0
    val (n, _, _, _, chi2, _) = run(rows)
    // naive driver recompute with the identical per-cell floor
    val obs = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val as = rows.map(_._1).distinct.sorted; val bs = rows.map(_._2).distinct.sorted
    val rT = as.map(a => a -> rows.count(_._1 == a).toLong).toMap
    val cT = bs.map(b => b -> rows.count(_._2 == b).toLong).toMap
    val want = (for { a <- as; b <- bs } yield {
      val d = (obs.getOrElse((a, b), 0L) * n - rT(a) * cT(b)).toDouble
      math.floor(d * d / n / rT(a) / cT(b) * 1000000.0).toLong
    }).sum
    assert(chi2 == want)
  }

  test("q91 over testdata: dof and bounds sane, V in [0, 1]") {
    val r = Independence.customerChiSquare(spark, "/root/testdata/sf0.001").head
    assert(r.getLong(0) == Tables.customer(spark, "/root/testdata/sf0.001").count())
    assert(r.getLong(3) == (r.getLong(1) - 1) * (r.getLong(2) - 1))
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }
}
