package graft

import org.scalatest.funsuite.AnyFunSuite

import operators.MannKendall

class MannKendallSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    MannKendall.mkTest(rows.toDF("g", "d", "x"), "g", "d", "x")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))))
      .toMap

  /** Driver reference: S and tie-corrected 18·Var(S). */
  private def reference(xs: Seq[Long]): (Long, Long) = {
    val n = xs.size.toLong
    val s = (for {
      i <- xs.indices; j <- xs.indices if i < j
    } yield math.signum(xs(j) - xs(i)).toLong).sum
    val tie18 = xs.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    (s, n * (n - 1) * (2 * n + 5) - tie18)
  }

  test("strictly monotone series: S = ±C(n,2), trend called at 5%") {
    val up = (1L to 30L).map(d => ("up", d, d * 10))
    val dn = (1L to 30L).map(d => ("dn", d, 1000 - d * 10))
    val out = run(up ++ dn)
    assert(out("up")._2 == 435L && out("up")._5 == "increasing")
    assert(out("dn")._2 == -435L && out("dn")._5 == "decreasing")
  }

  test("constant series: S = 0, var18 = 0, z = 0, no_trend") {
    val out = run((1L to 12L).map(d => ("c", d, 7L)))
    assert(out("c") == ((12L, 0L, 0L, 0.0, "no_trend")))
  }

  test("S and tie-corrected variance equal the brute-force reference") {
    val xs = Seq(5L, 3L, 3L, 8L, 1L, 8L, 8L, 2L, 9L, 3L, 5L, 7L)
    val (s, var18) = reference(xs)
    val out = run(xs.zipWithIndex.map { case (x, i) => ("t", i.toLong, x) })
    assert(out("t")._2 == s)
    assert(out("t")._3 == var18)
    val z = (if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0) /
      math.sqrt(var18 / 18.0)
    assert(math.abs(out("t")._4 - z) < 1e-6)
  }

  test("single-bucket series: reported as (S = 0, var18 = 0, no_trend)") {
    val out = run(Seq(("one", 5L, 42L), ("two", 1L, 1L), ("two", 2L, 9L)))
    assert(out("one") == ((1L, 0L, 0L, 0.0, "no_trend")))
    assert(out("two")._1 == 2L) // sanity: multi-day group unaffected
  }

  test("trendless shuffle stays inside the 5% band") {
    val xs = Seq(4L, 9L, 1L, 7L, 2L, 8L, 3L, 10L, 5L, 6L, 12L, 0L, 11L, 13L)
      .zipWithIndex.map { case (x, i) => ("r", i.toLong, x) }
    assert(run(xs)("r")._5 == "no_trend")
  }

  test("real data: plan has no windows; S bounded by C(n_days, 2)") {
    val df = MannKendall.orderRevenueTrend(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("- Window ["), "MK is aggregates + one pair join")
    assert(!p.contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getLong(2))
      assert(math.abs(s) <= n * (n - 1) / 2)
    }
  }
}
