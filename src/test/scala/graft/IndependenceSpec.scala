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

  private def mi(rows: Seq[(String, String)]) = {
    import spark.implicits._
    Independence.mutualInfo(rows.toDF("a", "b"), "a", "b").head()
  }

  test("q104: bijective dependence gives MI = H(A) = H(B), NMI = 1") {
    // uniform 4-level bijection: H = ln 4 = 1.386294
    val rows = Seq("w", "x", "y", "z").flatMap(v => Seq.fill(3)((v, v.toUpperCase)))
    val r = mi(rows)
    assert(r.getDouble(r.fieldIndex("h_a")) == 1.386294)
    assert(r.getDouble(r.fieldIndex("h_b")) == 1.386294)
    assert(r.getDouble(r.fieldIndex("mi")) == 1.386294)
    assert(r.getDouble(r.fieldIndex("nmi")) == 1.0)
  }

  test("q104: exact product independence gives MI = 0; one-level margin NMI NULL") {
    // joint = product of margins exactly: counts a×b = (2,4)⊗(1,3)
    val rows = for {
      (a, ca) <- Seq(("a1", 2), ("a2", 4))
      (b, cb) <- Seq(("b1", 1), ("b2", 3))
      _ <- 1 to (ca * cb)
    } yield (a, b)
    val r = mi(rows)
    assert(r.getDouble(r.fieldIndex("mi")) == 0.0)
    val one = mi(Seq(("a", "x"), ("a", "y"), ("a", "y")))
    assert(one.getDouble(one.fieldIndex("h_a")) == 0.0)
    assert(one.isNullAt(one.fieldIndex("nmi")))
  }

  test("q104: brute-force nats parity on a skewed planted table") {
    val rows = Seq.fill(5)(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(7)(("b", "z")) ++ Seq(("c", "z"))
    val n = rows.size.toDouble
    val obs = rows.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val rT = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val cT = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toDouble }
    val want = obs.map { case ((a, b), o) =>
      (o / n) * math.log(o * n / (rT(a) * cT(b)))
    }.sum
    val r = mi(rows)
    assert(math.abs(r.getDouble(r.fieldIndex("mi")) - want) < 2e-6)
    // data-processing bound: MI ≤ min(H)
    assert(r.getDouble(r.fieldIndex("mi")) <=
      math.min(r.getDouble(r.fieldIndex("h_a")), r.getDouble(r.fieldIndex("h_b"))) + 1e-9)
  }
}
