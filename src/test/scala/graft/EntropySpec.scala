package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.Entropy

class EntropySpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Entropy.tokenEntropy(rows.toDF("g", "text"), "g", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).sortBy(_._1).toSeq

  test("uniform vocabulary: entropy = ln(v), normalized = 1") {
    val got = run(Seq(("a", "w x y z")))
    val (_, n, v, h, nh) = got.head
    assert(n == 4L && v == 4L)
    assert(math.abs(h - math.log(4.0)) < 1e-6)
    assert(nh == 1.0)
  }

  test("single repeated token: entropy 0, normalized NULL (ln 1 = 0)") {
    val got = run(Seq(("b", "t t t t t")))
    assert(got.head._4 == 0.0)
    assert(got.head._5.isNaN)
  }

  test("hand distribution: H(1/2,1/4,1/4) = 1.5 ln 2") {
    val got = run(Seq(("c", "p p q r")))
    assert(math.abs(got.head._4 - 1.5 * math.log(2.0)) < 1e-6)
  }

  test("groups independent; empty tokens dropped") {
    val got = run(Seq(("u", "a  b"), ("w", "a a a b")))
    assert(got.map(_._1) == Seq("u", "w"))
    assert(got(0)._2 == 2L) // the double space yields no empty token
    assert(math.abs(got(0)._4 - math.log(2.0)) < 1e-6)
    // H(3/4,1/4) = ln4 - (3/4)ln3 ≈ 0.5623
    assert(math.abs(got(1)._4 - (math.log(4.0) - 0.75 * math.log(3.0))) < 1e-6)
  }

  test("skew monotonicity: repetition lowers normalized entropy") {
    val got = run(Seq(("even", "a b c d a b c d"),
      ("skew", "a a a a a b c d")))
    val by = got.map(t => t._1 -> t._5).toMap
    assert(by("even") == 1.0)
    assert(by("skew") < 1.0)
  }

  test("real documents: per-source rows, norm_entropy in (0,1]") {
    val df = Entropy.sourceEntropy(spark, "/root/testdata/sf0.001").cache()
    val sources = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(countDistinct("source")).collect().head.getLong(0)
    assert(df.count() == sources)
    assert(df.filter(col("norm_entropy") <= 0.0 ||
      col("norm_entropy") > 1.0).count() == 0)
    assert(df.filter(col("vocab") > col("n_tokens")).count() == 0)
  }
}
