package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Intervals

/** Interval union (q299): hand-computed merges — overlap, touch,
  * containment, gaps — a brute-force coverage cross-check, and the
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class IntervalsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def cov(iv: Seq[(Long, Long)]) = {
    import spark.implicits._
    Intervals.coverage(
      iv.map { case (s, e) => ("k", s, e) }.toDF("k", "s", "e")
        .repartition(4))
      .collect().head
  }

  test("overlap and adjacency merge; a gap splits") {
    // [1,5] ∪ [4,8] overlap; [9,10] is ADJACENT (day 9 follows
    // inclusive day 8 seamlessly) so it merges too; [15,16] opens a
    // new block across the 4-day hole 11..14
    val r = cov(Seq((1L, 5L), (4L, 8L), (9L, 10L), (15L, 16L)))
    assert(r.getLong(r.fieldIndex("n_intervals")) == 4L)
    assert(r.getLong(r.fieldIndex("n_blocks")) == 2L)
    assert(r.getLong(r.fieldIndex("covered")) == 10 + 2)
    assert(r.getLong(r.fieldIndex("max_gap")) == 4L)
  }

  test("containment merges fully") {
    val r = cov(Seq((1L, 20L), (5L, 7L), (10L, 12L)))
    assert(r.getLong(r.fieldIndex("n_blocks")) == 1L)
    assert(r.getLong(r.fieldIndex("covered")) == 20L)
    assert(r.getLong(r.fieldIndex("max_gap")) == 0L)
  }

  test("brute-force day-set cross-check on a scattered fleet") {
    val iv = Seq((3L, 9L), (1L, 2L), (8L, 14L), (20L, 20L), (17L, 18L),
      (30L, 35L), (33L, 40L), (2L, 2L))
    val days = iv.flatMap { case (s, e) => s to e }.toSet
    val r = cov(iv)
    assert(r.getLong(r.fieldIndex("covered")) == days.size.toLong)
    // blocks = maximal runs of consecutive covered days
    val blocks = days.toSeq.sorted.foldLeft(List.empty[(Long, Long)]) {
      case (acc, d) => acc match {
        case (s, e) :: t if d == e + 1 => (s, d) :: t
        case _ => (d, d) :: acc
      }
    }
    assert(r.getLong(r.fieldIndex("n_blocks")) == blocks.size.toLong)
    val gaps = blocks.sortBy(_._1).sliding(2).collect {
      case List((_, e1), (s2, _)) => s2 - e1 - 1
    }.toSeq
    assert(r.getLong(r.fieldIndex("max_gap")) ==
      (if (gaps.isEmpty) 0L else gaps.max))
  }

  test("degenerate single-day interval") {
    val r = cov(Seq((7L, 7L)))
    assert(r.getLong(r.fieldIndex("covered")) == 1L)
    assert(r.getLong(r.fieldIndex("max_gap")) == 0L)
  }

  test("registered shape: per-customer activity coverage, spans are sane") {
    val df = Intervals.customerActivityCoverage(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("o_custkey", "n_intervals", "n_blocks",
      "covered", "max_gap"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every block spans at least the 30-day window
      assert(r.getLong(r.fieldIndex("covered")) >=
        Intervals.ActiveDays * r.getLong(r.fieldIndex("n_blocks")))
      assert(r.getLong(r.fieldIndex("n_intervals")) >=
        r.getLong(r.fieldIndex("n_blocks")))
    }
  }
}
