package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.JsMatrix

class JsMatrixSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    JsMatrix.jsMatrix(rows.toDF("g", "text"), "g", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("identical distributions: JS = 0") {
    val got = run(Seq(("a", "x x y z"), ("b", "x x y z")))
    val Seq((_, _, na, nb, shared, js, norm)) = got
    assert((na, nb, shared) == (4L, 4L, 3L))
    assert(js == 0.0 && norm == 0.0)
  }

  test("disjoint vocabularies: JS = ln 2 exactly (norm = 1)") {
    // no shared terms → the pair never meets the inner join; verify via
    // a pair sharing ONE negligible bridge token so the row exists
    val got = run(Seq(("a", "p p p p p p p p p bridge"),
      ("b", "q q q q q q q q q bridge")))
    val Seq((_, _, _, _, shared, js, norm)) = got
    assert(shared == 1L)
    // 9/10 of each mass is one-sided (ln 2); the bridge term is
    // symmetric (ratio 1 → ln 1 = 0): JS = 0.9·ln2
    assert(math.abs(js - 0.9 * math.log(2.0)) < 1e-4)
    assert(math.abs(norm - 0.9) < 1e-4)
  }

  test("hand case: half-overlapping unigrams") {
    // a: {x:2, y:2}, b: {x:2, z:2} → p=q=1/2 on x (0 contribution);
    // y and z fully one-sided: each side contributes (1/2)·ln2 / ... :
    // JS = 1/2·[0.5·ln2] + 1/2·[0.5·ln2] = 0.5·ln2
    val got = run(Seq(("a", "x x y y"), ("b", "x x z z")))
    val Seq((_, _, _, _, shared, js, _)) = got
    assert(shared == 1L)
    assert(math.abs(js - 0.5 * math.log(2.0)) < 1e-4)
  }

  test("triangle of sources yields all three pairs, symmetric bounds hold") {
    val got = run(Seq(("a", "x y"), ("b", "x z"), ("c", "y z w")))
    assert(got.map(t => (t._1, t._2)) == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got.forall(t => t._6 >= 0.0 && t._6 <= math.log(2.0) + 1e-9))
  }

  test("real corpus: C(20,2) pairs, all interior (shared vocabulary)") {
    val df = JsMatrix.sourceJsMatrix(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() == 190)
    assert(df.filter(col("js_norm") < 0.0 || col("js_norm") > 1.0).count() == 0)
    // every synthetic source draws from the same vocabulary: the
    // matrix should read "largely interchangeable" — the mixing signal
    assert(df.agg(max("js_norm")).collect().head.getDouble(0) < 0.5)
  }
}
