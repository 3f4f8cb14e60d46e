package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Hurst

/** Hurst R/S (q280): hand-computed block R/S, the persistent vs
  * anti-persistent ordering, ragged-tail and degenerate guards, and
  * the registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class HurstSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def rs(ys: Seq[Long], sizes: Seq[Int]) = {
    import spark.implicits._
    Hurst.hurstRs(
      ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
        .toDF("i", "y").repartition(4), sizes)
      .collect().map(r => r.getInt(r.fieldIndex("win_n")) -> r).toMap
  }

  test("hand-computed block: alternating 0/1 at n=4 gives R/S exactly 1") {
    // block [0,1,0,1]: R = 0.5, S = 0.5 (population) → R/S = 1
    val m = rs(Seq(0L, 1L, 0L, 1L, 0L, 1L, 0L, 1L), Seq(4))
    val r = m(4)
    assert(r.getLong(r.fieldIndex("n_blocks")) == 2L)
    assert(r.getDouble(r.fieldIndex("rs_mean")) == 1.0)
    // single size: the log-log fit is singular → hurst NULL
    assert(r.isNullAt(r.fieldIndex("hurst")))
  }

  test("trend beats alternation: H(linear) > H(alternating)") {
    val n = 256
    val trend = rs((0 until n).map(_.toLong), Seq(8, 16, 32, 64))
    val alt = rs((0 until n).map(i => (i % 2).toLong), Seq(8, 16, 32, 64))
    val hT = trend(8).getDouble(trend(8).fieldIndex("hurst"))
    val hA = alt(8).getDouble(alt(8).fieldIndex("hurst"))
    assert(hT > 0.8)  // persistent: R/S grows nearly linearly in n
    assert(hA < 0.1)  // anti-persistent: R/S flat across sizes
    assert(hT > hA)
    // hurst is replicated identically on every size row
    assert(Seq(16, 32, 64).forall(s =>
      trend(s).getDouble(trend(s).fieldIndex("hurst")) == hT))
  }

  test("ragged tail is dropped: 10 points at n=4 keep exactly 2 blocks") {
    val m = rs((0 until 10).map(i => ((i * 3) % 7).toLong), Seq(4))
    assert(m(4).getLong(m(4).fieldIndex("n_blocks")) == 2L)
  }

  test("constant series: zero variance blocks are excluded entirely") {
    val m = rs(Seq.fill(32)(5L), Seq(4, 8))
    assert(m.isEmpty) // every block has S = 0 → no rs rows survive
  }

  test("registered shape: one row per dyadic size with a shared H") {
    val df = Hurst.dailyRevenueHurst(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("win_n", "n_blocks", "rs_mean", "hurst"))
    assert(rows.map(_.getInt(0)).sorted.toSeq == Hurst.Sizes)
    val hs = rows.map(r => r.getDouble(r.fieldIndex("hurst"))).distinct
    assert(hs.length == 1)
    assert(hs.head > 0.0 && hs.head < 1.2)
  }
}
