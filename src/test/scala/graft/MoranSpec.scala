package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Moran

/** Moran's I (q249): brute-force parity (the n-cancellation is the
  * thing under test), clustered/checkerboard extremes, the constant-
  * surface NULL, isolated-unit treatment, and the registered
  * nation-map audit. Value-level oracle equivalence runs through
  * graft.Verify. */
class MoranSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(xs: Map[Int, Long], adj: Seq[(Int, Int)]) = {
    import spark.implicits._
    Moran.moransI(
      xs.toSeq.map { case (u, x) => (u.toLong, x) }.toDF("u", "x"),
      adj.map { case (a, b) => (a.toLong, b.toLong) }.toDF("ui", "uj"))
      .collect().head
  }

  /** Symmetric closure of undirected edge list. */
  private def sym(e: Seq[(Int, Int)]): Seq[(Int, Int)] =
    e ++ e.map(_.swap)

  private def ref(xs: Map[Int, Long], adj: Seq[(Int, Int)]): Double = {
    val n = xs.size
    val mean = xs.values.sum.toDouble / n
    val z = xs.map { case (k, v) => k -> (v - mean) }
    val num = adj.map { case (i, j) => z(i) * z(j) }.sum
    val den = z.values.map(v => v * v).sum
    BigDecimal(n.toDouble * num / (adj.size * den))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("brute-force parity on a random block map") {
    val rnd = new scala.util.Random(249)
    (1 to 4).foreach { _ =>
      val xs = (0 until 12).map(i => i -> (rnd.nextInt(1000).toLong)).toMap
      // 4 blocks of 3, fully connected within block
      val adj = sym(for {
        b <- 0 until 4; i <- 0 until 3; j <- i + 1 until 3
      } yield (b * 3 + i, b * 3 + j))
      val got = fit(xs, adj).getDouble(2)
      assert(got == ref(xs, adj), s"xs $xs")
    }
  }

  test("clustered map reads strongly positive") {
    // two blocks, values far apart within-block identical-ish
    val xs = Map(0 -> 100L, 1 -> 110L, 2 -> 105L,
      3 -> 900L, 4 -> 890L, 5 -> 910L)
    val adj = sym(Seq((0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)))
    assert(fit(xs, adj).getDouble(2) > 0.8)
  }

  test("perfect checkerboard reads exactly -1") {
    // 2-unit regions with perfectly anti-correlated values
    val xs = Map(0 -> 10L, 1 -> -10L, 2 -> 10L, 3 -> -10L,
      4 -> 10L, 5 -> -10L)
    val adj = sym(Seq((0, 1), (2, 3), (4, 5)))
    assert(fit(xs, adj).getDouble(2) == -1.0)
  }

  test("constant surface is NULL, not an error") {
    val xs = Map(0 -> 7L, 1 -> 7L, 2 -> 7L, 3 -> 7L)
    val row = fit(xs, sym(Seq((0, 1), (2, 3))))
    assert(row.isNullAt(row.fieldIndex("morans_i")))
  }

  test("isolated units stay in n and the denominator") {
    // unit 4 has no neighbors; reference treats it the same way
    val xs = Map(0 -> 10L, 1 -> 12L, 2 -> 50L, 3 -> 55L, 4 -> 500L)
    val adj = sym(Seq((0, 1), (2, 3)))
    assert(fit(xs, adj).getDouble(2) == ref(xs, adj))
    assert(fit(xs, adj).getLong(0) == 5L)
  }

  test("registered q249 at sf0.001: 25 nations, E[I] pinned") {
    val row = Moran.nationBalanceMoran(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(row.fieldIndex("n_units")) == 25L)
    assert(row.getLong(row.fieldIndex("s0")) == 100L) // 5 regions x 5x4
    assert(row.getDouble(row.fieldIndex("e_i")) == -0.041667)
    val i = row.getDouble(row.fieldIndex("morans_i"))
    assert(i >= -1.1 && i <= 1.1)
  }
}
