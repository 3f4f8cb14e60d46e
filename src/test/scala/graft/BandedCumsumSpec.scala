package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.BandedCumsum

class BandedCumsumSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def reference(rows: Seq[(String, Long, Long, Long)]) =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      val cumA = sorted.map(_._3).scanLeft(0L)(_ + _).tail
      val cumB = sorted.map(_._4).scanLeft(0L)(_ + _).tail
      sorted.lazyZip(cumA).lazyZip(cumB).map { case ((_, k, _, _), a, b) =>
        (g, k, a, b)
      }
    }.sortBy(r => (r._1, r._2))

  private def run(rows: Seq[(String, Long, Long, Long)], bw: Long) =
    BandedCumsum.cumsum(rows.toDF("g", "k", "a", "b"),
        Seq("g"), "k", Seq("a", "b"), bw)
      .select("g", "k", "cum_a", "cum_b")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq

  val rnd = new scala.util.Random(42)
  val dense: Seq[(String, Long, Long, Long)] = for {
    g <- Seq("x", "y", "z"); k <- 0L until 100L
  } yield (g, k, rnd.nextInt(1000).toLong - 200, rnd.nextInt(50).toLong)

  test("banded ≡ global window on dense keys, every band width") {
    val want = reference(dense)
    for (bw <- Seq(1L, 3L, 7L, 64L, 1L << 16))
      assert(run(dense, bw) == want, s"bandWidth=$bw diverged")
  }

  test("sparse + negative keys: trunc-div banding stays monotone") {
    val sparse = Seq(
      ("s", -2000000L, 5L, 1L), ("s", -3L, 7L, 2L), ("s", -1L, 11L, 3L),
      ("s", 0L, 13L, 4L), ("s", 2L, 17L, 5L), ("s", 999999999L, 19L, 6L),
      ("t", -65536L, 23L, 7L), ("t", 65536L, 29L, 8L))
    val want = reference(sparse)
    for (bw <- Seq(1L, 2L, 65536L)) assert(run(sparse, bw) == want)
  }

  test("single group, one giant value column: no overflow surprises") {
    val big = (0L until 10L).map(k => ("g", k, Long.MaxValue / 20, 0L))
    val got = run(big, 3L)
    assert(got.map(_._3) == (1L to 10L).map(_ * (Long.MaxValue / 20)))
  }

  test("plan: offsets broadcast; every window partitions on the band") {
    val df = BandedCumsum.cumsum(dense.toDF("g", "k", "a", "b"),
      Seq("g"), "k", Seq("a", "b"), 16L)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "band offsets must broadcast back")
    val bandless = p.linesIterator.filter(_.contains("- Window ["))
      .filterNot(_.contains("__band")).toSeq
    assert(bandless.isEmpty,
      s"window without the band in its spec: ${bandless.mkString("; ")}")
  }

  test("rowNumber ≡ window row_number: asc key, every band width") {
    import org.apache.spark.sql.expressions.{Window => W}
    val df = dense.toDF("g", "k", "a", "b")
    val want = df.withColumn("rn",
        row_number().over(W.partitionBy("g").orderBy("k")))
      .select("g", "k", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong))
      .sortBy(r => (r._1, r._2)).toSeq
    for (bw <- Seq(1L, 16L, 1L << 16)) {
      val got = BandedCumsum.rowNumber(df, Seq("g"),
          expr(s"k div ${bw}L"), Seq(col("k")), "rn")
        .select("g", "k", "rn").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._2)).toSeq
      assert(got == want, s"bandWidth=$bw diverged")
    }
  }

  test("rowNumber ≡ rank on a tie-free DESC composite order (q7 shape)") {
    import org.apache.spark.sql.expressions.{Window => W}
    // values deliberately collide so the composite tiebreak matters
    val rows = (1L to 200L).map(k => ("g", k, (k % 13) * 100))
    val df = rows.toDF("g", "k", "cents")
    val want = df.withColumn("r",
        rank().over(W.partitionBy("g").orderBy(col("cents").desc, col("k"))))
      .select("g", "k", "r").collect()
      .map(r => (r.getLong(1), r.getInt(2).toLong)).sortBy(_._1).toSeq
    val got = BandedCumsum.rowNumber(df, Seq("g"),
        expr("(-cents) div 3"), Seq(col("cents").desc, col("k")), "r")
      .select("g", "k", "r").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == want)
  }

  test("floor banding: every band spans exactly bandWidth keys, zero-straddling included") {
    // trunc-div would put keys -9..9 into one 19-key band 0 at bw=10;
    // floor semantics split them  -10..-1 | 0..9  (r10 advice #1)
    val keys = (-25L to 25L).toSeq
    val df = keys.map(k => ("g", k, 1L, 1L)).toDF("g", "k", "a", "b")
    val bands = df.selectExpr("k",
        BandedCumsum.floorDivBand("k", 10L) + " AS band")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    bands.groupBy(_._2).foreach { case (band, ks) =>
      assert(ks.length <= 10, s"band $band holds ${ks.length} keys > bandWidth")
      assert(ks.map(_._1).forall(k => k >= band * 10 && k < (band + 1) * 10),
        s"band $band keys ${ks.map(_._1).toSeq} outside [${band * 10}, ${(band + 1) * 10})")
    }
    // and the decomposition stays exact under floor banding
    val rows = keys.map(k => ("g", k, k % 7, 1L))
    assert(run(rows, 10L) == reference(rows))
  }

  test("sparse (hashed) order key fails loudly at the offsets level (r10 verdict #1)") {
    // 64 hash-like keys → 64 distinct bands in one group; cap at 8
    val sparse = (1L to 64L).map(k => ("g", k * 2654435761L, 1L, 1L))
    val ex = intercept[Exception] {
      BandedCumsum.cumsum(sparse.toDF("g", "k", "a", "b"),
        Seq("g"), "k", Seq("a"), maxBandsPerGroup = 8L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t.getMessage).toSeq ++ Option(t.getCause).toSeq.flatMap(msgs)
    assert(msgs(ex).exists(m => m.contains("BandedCumsum") &&
      m.contains("maxBandsPerGroup")), s"wrong error: ${msgs(ex)}")
    // same guard on rowNumber
    val ex2 = intercept[Exception] {
      BandedCumsum.rowNumber(sparse.toDF("g", "k", "a", "b"), Seq("g"),
        expr("k div 2"), Seq(col("k")), "rn", maxBandsPerGroup = 8L).collect()
    }
    assert(msgs(ex2).exists(_.contains("maxBandsPerGroup")))
    // dense keys at the default cap: untouched
    assert(run(dense, 16L) == reference(dense))
  }

  test("empty input: cumsum and rowNumber yield empty, no errors") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long, Long)].toDF("g", "k", "a", "b")
    assert(BandedCumsum.cumsum(empty, Seq("g"), "k", Seq("a")).count() == 0)
    assert(BandedCumsum.rowNumber(empty, Seq("g"), expr("k div 2"),
      Seq(col("k")), "rn").count() == 0)
  }

  test("q137 heaps is bandWidth-invariant (structural exactness)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val a = textstats.Heaps.heapsFit(docs, "source", "doc_id", "text", 8L)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = textstats.Heaps.heapsFit(docs, "source", "doc_id", "text")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b, "8-doc bands must reproduce the default fit exactly")
  }
}
