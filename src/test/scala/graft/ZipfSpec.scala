package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.Zipf

class ZipfSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(String, String)], topRanks: Int = 500) =
    Zipf.zipfFit(rows.toDF("g", "text"), "g", "text", topRanks)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).sortBy(_._1).toSeq

  test("exact power law c = 64 / rank gives slope -1, r2 = 1") {
    // freqs 64,32,16,8,4,2,1 for 7 terms: ln c = ln 64 - 1 * ln rank... only
    // for rank powers of two; use ranks 1,2,4 pattern instead — simplest
    // exact check: c(rank) = 64,32,16,8,4,2,1 is NOT 1/rank; construct
    // c = 720/rank for ranks 1..6: 720,360,240,180,144,120 — exact.
    val text = (1 to 6).flatMap { r =>
      List.fill(720 / r)(s"t$r")
    }.mkString(" ")
    val got = run(Seq(("a", text)))
    val (_, n, slope, intercept, r2) = got.head
    assert(n == 6L)
    assert(math.abs(slope - (-1.0)) < 1e-5)
    assert(math.abs(intercept - math.log(720.0)) < 1e-5)
    assert(math.abs(r2 - 1.0) < 1e-6)
  }

  test("uniform frequencies: slope 0, r2 NULL (zero variance in y)") {
    val got = run(Seq(("u", "a b c d e")))
    assert(got.head._3 == 0.0)
    assert(got.head._5.isNaN) // 0/0 via nullif
  }

  test("fewer than 3 ranked terms: r2 NULL, slope still defined at 2 points") {
    val got = run(Seq(("s", "x x y")))
    assert(got.head._2 == 2L)
    assert(got.head._5.isNaN)
    // two points (ln1, ln2) and (ln2, ln1): slope = -1 exactly
    assert(math.abs(got.head._3 - (-1.0)) < 1e-5)
  }

  test("topRanks caps the fitted head") {
    val text = (1 to 10).flatMap(r => List.fill(11 - r)(s"t$r")).mkString(" ")
    val got = run(Seq(("c", text)), topRanks = 4)
    assert(got.head._2 == 4L)
  }

  test("real corpus: every source fits with negative slope and r2 in (0,1]") {
    val df = Zipf.sourceZipf(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() ==
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select(countDistinct("source")).collect().head.getLong(0))
    assert(df.filter(col("slope") >= 0.0).count() == 0)
    assert(df.filter(col("r2") <= 0.0 || col("r2") > 1.0).count() == 0)
  }
}
