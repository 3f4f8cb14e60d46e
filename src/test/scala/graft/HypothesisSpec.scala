package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Hypothesis

/** Hypothesis-test operators vs hand-computed textbook values (the
  * planted numbers below are verified by the definitional formulas —
  * e.g. Mann–Whitney U by literally counting x>y pairs). Value-level
  * oracle equivalence runs through graft.Verify. */
class HypothesisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  // ---------------------------------------------------------------- Welch

  private def welch(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    Hypothesis.welchTTest(rows.toDF("g", "c", "x"), "g", "c", "A", "B", "x")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("welch t and df match the textbook computation") {
    // A = [10.5, 12.25, 11.0, 13.75] (m=11.875, s²=2.104167)
    // B = [20.0, 18.5, 22.25]        (m=20.25,  s²=3.5625)
    // t = -8.375/√(s²A/4 + s²B/3) = -6.3979, Welch–Satterthwaite df = 3.6826
    val rows = Seq(10.5, 12.25, 11.0, 13.75).map(("g1", "A", _)) ++
      Seq(20.0, 18.5, 22.25).map(("g1", "B", _))
    val r = welch(rows)("g1")
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 11.875 && r.getDouble(4) == 20.25)
    assert(r.getDouble(5) == -6.3979)
    assert(r.getDouble(6) == 3.6826)
  }

  test("welch: identical samples give t = 0; n < 2 side gives NULL t/df") {
    val same = Seq(1.0, 2.0, 3.0)
    val r = welch(same.map(("g1", "A", _)) ++ same.map(("g1", "B", _)))("g1")
    assert(r.getDouble(5) == 0.0)
    // one B observation: no variance on that side → NULL t and df
    val r1 = welch(Seq(1.0, 2.0, 3.0).map(("g2", "A", _)) :+ ("g2", "B", 9.0))("g2")
    assert(r1.isNullAt(5) && r1.isNullAt(6))
    // zero pooled SE (both sides constant): t undefined → NULL, not ±Inf
    val r0 = welch(Seq(5.0, 5.0).map(("g3", "A", _)) ++ Seq(7.0, 7.0).map(("g3", "B", _)))("g3")
    assert(r0.isNullAt(5))
  }

  // --------------------------------------------------------- Mann–Whitney

  private def mwu(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    Hypothesis.mannWhitneyU(rows.toDF("g", "c", "x"), "g", "c", "X", "Y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("mann-whitney U equals the pair count; tie-corrected z matches") {
    // X = [1,2,2,5], Y = [3,3,6]: U₁ = #(x>y) = 2 (only 5 beats the two 3s)
    // σ² with Σ(t³−t) = 12 over N=7 → z = (2 − 6)/σ = −1.4402
    val rows = Seq(1.0, 2.0, 2.0, 5.0).map(("g1", "X", _)) ++
      Seq(3.0, 3.0, 6.0).map(("g1", "Y", _))
    val r = mwu(rows)("g1")
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == -1.4402)
  }

  test("mann-whitney: stochastically identical samples give z = 0") {
    val rows = Seq(1.0, 2.0, 3.0).flatMap(v => Seq(("g1", "X", v), ("g1", "Y", v)))
    val r = mwu(rows)("g1")
    // U₁ = n₁n₂/2 by symmetry → z = 0; all-tied σ² stays positive here
    assert(r.getDouble(3) == 4.5 && r.getDouble(4) == 0.0)
  }

  test("mann-whitney: fully tied single value has σ = 0 → NULL z") {
    val rows = Seq(("g1", "X", 4.0), ("g1", "X", 4.0), ("g1", "Y", 4.0))
    val r = mwu(rows)("g1")
    assert(r.getDouble(3) == 1.0 && r.isNullAt(4))
  }

  // ---------------------------------------------------------------- ANOVA

  test("anova F matches the exact textbook decomposition") {
    import spark.implicits._
    // [1,2,3], [4,5,6], [7,8,9]: SSB = 54, SSW = 6 → F = (54/2)/(6/6) = 27
    val rows = Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)) ++
      Seq(7, 8, 9).map(("c", _))
    val df = rows.map { case (g, v) => (g, v.toDouble) }.toDF("g", "x")
    val r = Hypothesis.anovaF(df, "g", "x").head
    assert(r.getLong(0) == 3L && r.getLong(1) == 9L)
    assert(r.getDouble(2) == 5.0)   // grand mean
    assert(r.getDouble(3) == 27.0)  // F
    assert(r.getDouble(4) == 0.9)   // η² = 54/60
  }

  // ------------------------------------------------- Kolmogorov–Smirnov

  private def ks(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    Hypothesis.ksTest(rows.toDF("g", "c", "x"), "g", "c", "X", "Y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("ks D equals the hand-computed ECDF supremum") {
    // X = [1,2,2,5], Y = [3,3,6]: at v=2, F̂x = 3/4 vs F̂y = 0 → D = 0.75
    // (numerator max|c1·n2 − c2·n1| = |3·3 − 0·4| = 9 over n1·n2 = 12)
    val rows = Seq(1.0, 2.0, 2.0, 5.0).map(("g1", "X", _)) ++
      Seq(3.0, 3.0, 6.0).map(("g1", "Y", _))
    val r = ks(rows)("g1")
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.75)
    // z = 0.75·√(12/7) = 0.982 at the round-4 grid
    assert(math.abs(r.getDouble(4) - 0.75 * math.sqrt(12.0 / 7.0)) < 5e-5)
  }

  test("ks: identical samples give D = 0; empty side gives NULL") {
    val same = Seq(1.0, 2.0, 3.0)
    val r = ks(same.map(("g1", "X", _)) ++ same.map(("g1", "Y", _)))("g1")
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    val r0 = ks(Seq(1.0, 2.0).map(("g2", "X", _)))("g2")
    assert(r0.getLong(2) == 0L && r0.isNullAt(3) && r0.isNullAt(4))
  }

  // --------------------------------------------- Jensen–Shannon divergence

  private def js(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    Hypothesis.jsDivergence(rows.toDF("g", "c", "x"), "g", "c", "X", "Y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("js: identical → 0, disjoint → ln 2, symmetric, matches brute force") {
    val same = Seq(1.0, 2.0, 2.0, 3.0)
    val r0 = js(same.map(("g1", "X", _)) ++ same.map(("g1", "Y", _)))("g1")
    assert(r0.getDouble(r0.fieldIndex("js_div")) == 0.0)
    // disjoint supports: JS = ln 2 exactly
    val rd = js(Seq(1.0, 2.0).map(("g2", "X", _)) ++
      Seq(9.0, 10.0).map(("g2", "Y", _)))("g2")
    assert(rd.getDouble(rd.fieldIndex("js_div")) == 0.693147)
    // asymmetric sample, brute-force recompute + symmetry under swap
    val xs = Seq(1.0, 1.0, 1.0, 2.0)
    val ys = Seq(1.0, 2.0, 2.0, 2.0, 3.0)
    def brute(a: Seq[Double], b: Seq[Double]): Double = {
      val (na, nb) = (a.size.toDouble, b.size.toDouble)
      val vals = (a ++ b).distinct
      vals.map { v =>
        val p = a.count(_ == v) / na
        val q = b.count(_ == v) / nb
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (q > 0) q * math.log(q / m) else 0.0)
      }.sum / 2
    }
    val fwd = js(xs.map(("g3", "X", _)) ++ ys.map(("g3", "Y", _)))("g3")
    val v = fwd.getDouble(fwd.fieldIndex("js_div"))
    assert(math.abs(v - brute(xs, ys)) < 2e-6, s"$v vs ${brute(xs, ys)}")
    val bwd = js(ys.map(("g3", "X", _)) ++ xs.map(("g3", "Y", _)))("g3")
    assert(bwd.getDouble(bwd.fieldIndex("js_div")) == v, "JS must be symmetric")
    // empty side → NULL (divergence vs nothing is undefined, not 0)
    val re = js(Seq(1.0, 2.0).map(("g4", "X", _)))("g4")
    assert(re.isNullAt(re.fieldIndex("js_div")))
  }

  // --------------------------------------------- Benjamini–Hochberg FDR

  test("bh q-values match a reference step-up computation and clamp at 1") {
    import spark.implicits._
    // z chosen so p spans the range; NULL z must be dropped from m
    val tests = Seq(("t1", Some(3.5)), ("t2", Some(2.0)), ("t3", Some(0.5)),
      ("t4", Some(0.1)), ("t5", None)).toDF("k", "z")
    val out = Hypothesis.bhAdjust(tests, "k", "z").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(!out.contains("t5") && out.size == 4)
    // reference BH over the operator's own p values (the spec checks
    // the step-up window logic, not the erfc chain — that has its own
    // q94 parity history)
    val ps = out.toSeq.map { case (k, (p, _, _)) => (k, p) }.sortBy(t => (t._2, t._1))
    val m = ps.size
    val raw = ps.zipWithIndex.map { case ((k, p), i) => (k, p * m / (i + 1)) }
    val qs = raw.scanRight(("", Double.MaxValue)) { case ((k, v), (_, acc)) =>
      (k, math.min(v, acc))
    }.dropRight(1).map { case (k, v) => k -> math.min(v, 1.0) }.toMap
    // tolerance: the reference runs on round-6 p_norm, the operator on
    // the unrounded p — up to m/rank·5e-7 apart
    out.foreach { case (k, (_, _, qGot)) =>
      assert(math.abs(qGot - qs(k)) < 5e-6, s"$k: $qGot vs ${qs(k)}")
    }
    // monotone in p-rank and clamped
    val byRank = out.values.toSeq.sortBy(_._2).map(_._3)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    assert(byRank.forall(q => q >= 0.0 && q <= 1.0))
    // t4 (z = 0.1) has p ≈ 0.92: its q is p·m/m = p itself (last rank)
    assert(math.abs(out("t4")._1 - out("t4")._3) < 1e-6)
  }

  test("anova: one group or zero within-variance degenerates to NULL F") {
    import spark.implicits._
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "x")
    val r1 = Hypothesis.anovaF(one, "g", "x").head
    assert(r1.getLong(0) == 1L && r1.isNullAt(3)) // k−1 = 0
    // constant within groups: SSW = 0 → F undefined → NULL (not Inf)
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)).toDF("g", "x")
    val r0 = Hypothesis.anovaF(const, "g", "x").head
    assert(r0.isNullAt(3) && r0.getDouble(4) == 1.0) // η² = 1 still defined
  }
}
