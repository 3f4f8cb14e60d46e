package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Paths

class PathsSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)], k: Int = 25) =
    Paths.topPaths3(rows.toDF("u", "ts", "id", "t"), "u", "ts", "id", "t", k)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq

  test("hand case: sliding trigrams, n-2 per user, support sums to 1") {
    // user 1: v,c,b,v → v>c>b, c>b>v; user 2: v,c,b → v>c>b
    val rows = Seq(
      (1L, 1L, 1L, "v"), (1L, 2L, 2L, "c"), (1L, 3L, 3L, "b"), (1L, 4L, 4L, "v"),
      (2L, 1L, 5L, "v"), (2L, 2L, 6L, "c"), (2L, 3L, 7L, "b"))
    val got = run(rows)
    assert(got.toSeq == Seq(
      (1, "v>c>b", 2L, 0.6667), (2, "c>b>v", 1L, 0.3333)))
  }

  test("users with fewer than 3 events contribute nothing") {
    val got = run(Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (2L, 1L, 3L, "a")))
    assert(got.isEmpty)
  }

  test("paths never cross users") {
    val rows = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (2L, 3L, 3L, "c"), (2L, 4L, 4L, "d"))
    assert(run(rows).isEmpty)
  }

  test("count ties rank alphabetically by path") {
    val rows = Seq(
      (1L, 1L, 1L, "z"), (1L, 2L, 2L, "z"), (1L, 3L, 3L, "z"),
      (2L, 1L, 4L, "a"), (2L, 2L, 5L, "a"), (2L, 3L, 6L, "a"))
    val got = run(rows)
    assert(got.map(_._2) == Seq("a>a>a", "z>z>z"))
    assert(got.map(_._1) == Seq(1, 2))
  }

  test("same-ts ordering is pinned by event_id") {
    val rows = Seq(
      (1L, 1L, 10L, "a"), (1L, 1L, 20L, "b"), (1L, 1L, 30L, "c"))
    assert(run(rows).head._2 == "a>b>c")
  }

  test("real events: k rows, support in (0,1], composes with q50 total order") {
    val df = Paths.topUserPaths(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() == 25)
    assert(df.filter(col("support") <= 0.0 || col("support") > 1.0).count() == 0)
    assert(df.agg(min("rk"), max("rk")).collect().head.toSeq == Seq(1, 25))
  }
}
