package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Survival

/** Kaplan–Meier invariants. Value-level oracle equivalence runs
  * through graft.Verify. */
class SurvivalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def km(obs: Seq[(String, Long, Int)]) = {
    import spark.implicits._
    Survival.kaplanMeier(obs.toDF("g", "dur", "event")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
  }

  test("textbook curve: censoring removes subjects from risk without a step") {
    // durations: 1 event, 2 censored, two events at 3, 4 censored
    val got = km(Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1),
      ("g", 3L, 1), ("g", 4L, 0)))
    assert(got.keySet == Set(("g", 1L), ("g", 3L))) // steps at event times only
    val (n1, d1, c1, s1) = got(("g", 1L))
    assert((n1, d1, c1) == ((5L, 1L, 0L)) && s1 == 0.8)
    val (n3, d3, c3, s3) = got(("g", 3L))
    // at t=3: 5 - 1 event - 1 censored = 3 at risk, 2 die
    assert((n3, d3, c3) == ((3L, 2L, 0L)))
    assert(math.abs(s3 - 0.8 / 3.0) < 1e-6) // 0.8 * (1/3)
  }

  test("no censoring: the product telescopes to the empirical survival") {
    val got = km((1L to 10L).map(t => ("g", t, 1)))
    (1L to 10L).foreach { t =>
      val (n, d, _, s) = got(("g", t))
      assert(n == 10L - t + 1 && d == 1L)
      assert(math.abs(s - (10.0 - t) / 10.0) < 1e-6,
        s"S($t) = $s, want ${(10.0 - t) / 10.0}")
    }
  }

  test("total death in one step: survival exactly 0.0, no poisoned later rows") {
    val got = km(Seq(("g", 5L, 1), ("g", 5L, 1), ("g", 5L, 1)))
    assert(got == Map(("g", 5L) -> ((3L, 3L, 0L, 0.0))))
  }

  test("censored at an event time still count as at risk there") {
    val got = km(Seq(("g", 2L, 1), ("g", 2L, 0), ("g", 3L, 1)))
    val (n2, d2, c2, s2) = got(("g", 2L))
    assert((n2, d2, c2) == ((3L, 1L, 1L)))
    assert(math.abs(s2 - 2.0 / 3.0) < 1e-6)
    // the censored subject then leaves: only 1 at risk at t=3
    val (n3, _, _, s3) = got(("g", 3L))
    assert(n3 == 1L && s3 == 0.0)
  }

  test("groups are independent curves") {
    val got = km(Seq(("a", 1L, 1), ("a", 2L, 1), ("b", 1L, 1)))
    assert(math.abs(got(("a", 1L))._4 - 0.5) < 1e-6)
    assert(got(("b", 1L))._4 == 0.0)
  }

  test("q110 over testdata: curves are monotone non-increasing per segment") {
    val rows = Survival.segmentChurn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val ordered = rs.sortBy(_._2).map(_._3)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b <= a + 1e-9, s"$seg curve rose: $a -> $b")
        case _ =>
      }
      assert(ordered.head <= 1.0 && ordered.last >= 0.0)
    }
  }
}
