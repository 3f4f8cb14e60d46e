package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.GetisOrd

/** Getis–Ord Gi* (q286): a planted hot block on a two-block map, a
  * direct double-precision cross-check, flat-surface guard, and the
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class GetisOrdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** Units 0..n-1 valued xs, adjacency = same block of size `blk`
    * (minus self). */
  private def gi(xs: Seq[Long], blk: Int) = {
    import spark.implicits._
    val units = xs.zipWithIndex.map { case (x, u) => (u.toLong, x) }
    val adj = for {
      (_, i) <- xs.zipWithIndex; (_, j) <- xs.zipWithIndex
      if i != j && i / blk == j / blk
    } yield (i.toLong, j.toLong)
    GetisOrd.giStar(
      units.toDF("u", "x").repartition(4),
      adj.toDF("ui", "uj").repartition(4))
      .collect().map(r => r.getLong(r.fieldIndex("u")) -> r).toMap
  }

  test("a hot block lights up positive, the cold block negative") {
    // block 0 (units 0-3) high, block 1 (units 4-7) low
    val m = gi(Seq(100L, 110L, 105L, 95L, 10L, 5L, 15L, 10L), 4)
    assert(m(0).getInt(m(0).fieldIndex("hot")) == 1)
    assert(m(4).getInt(m(4).fieldIndex("hot")) == -1)
    assert(m(0).getDouble(m(0).fieldIndex("gi_z")) > 1.96)
    assert(m(4).getDouble(m(4).fieldIndex("gi_z")) < -1.96)
  }

  test("z matches a direct double-precision Gi* computation") {
    val xs = Seq(8L, 3L, 12L, 7L, 2L, 9L, 4L, 11L, 6L)
    val blk = 3
    val m = gi(xs, blk)
    val n = xs.size.toDouble
    val xbar = xs.sum / n
    val s = math.sqrt(xs.map(x => x * x).sum / n - xbar * xbar)
    for (u <- xs.indices) {
      val hood = xs.indices.filter(j => j / blk == u / blk)
      val w = hood.size.toDouble
      val bsum = hood.map(xs).sum.toDouble
      val z = (bsum - w * xbar) /
        (s * math.sqrt((n * w - w * w) / (n - 1)))
      assert(math.abs(m(u).getDouble(m(u).fieldIndex("gi_z")) - z) < 1e-5,
        s"unit $u")
    }
  }

  test("w_i counts the closed neighborhood (self included)") {
    val m = gi(Seq(1L, 2L, 3L, 4L), 2)
    assert(m.values.forall(_.getLong(1) == 2L))
  }

  test("flat surface: zero variance makes every z NULL") {
    val m = gi(Seq.fill(6)(7L), 3)
    assert(m.values.forall(_.isNullAt(2)))
  }

  test("registered shape: one row per nation") {
    val df = GetisOrd.nationBalanceGiStar(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("n_nationkey", "w_i", "gi_z", "hot"))
    assert(rows.length == 25)
    // every nation's closed neighborhood is its 5-nation region
    assert(rows.forall(_.getLong(1) == 5L))
  }
}
