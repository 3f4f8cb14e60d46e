package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Isotonic

/** Isotonic PAVA recalibration (q247): exact parity with a rational
  * pool-adjacent-violators reference (the minimax-floor identity is
  * the thing under test), no-op on monotone input, hand-pooled and
  * weighted cases, global monotonicity, and the registered per-year
  * lookup table. Value-level oracle equivalence runs through
  * graft.Verify. */
class IsotonicSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fitOf(cells: Seq[(Long, Long)]): Seq[Long] = {
    import spark.implicits._
    val df = cells.zipWithIndex
      .map { case ((n, x), i) => (s"g$i", i.toLong, n, x) }
      .toDF("g", "o", "n", "x")
    Isotonic.isotonicFit(df).collect()
      .map(r => r.getLong(r.fieldIndex("o")) ->
        r.getLong(r.fieldIndex("iso_micro")))
      .sortBy(_._1).map(_._2).toSeq
  }

  /** Reference: classical sequential PAVA in exact rational
    * arithmetic, floored to micro at the end. */
  private def refPava(cells: Seq[(Long, Long)]): Seq[Long] = {
    // blocks of (N, X, width), pooling while the previous mean >= ours
    var blocks = List.empty[(BigInt, BigInt, Int)]
    cells.foreach { case (n, x) =>
      var (bn, bx, bw) = (BigInt(n), BigInt(x), 1)
      while (blocks.nonEmpty &&
        blocks.head._2 * bn >= bx * blocks.head._1) {
        val (pn, px, pw) = blocks.head
        blocks = blocks.tail
        bn += pn; bx += px; bw += pw
      }
      blocks = (bn, bx, bw) :: blocks
    }
    blocks.reverse.flatMap { case (n, x, w) =>
      Seq.fill(w)(((BigInt(1000000) * x) / n).toLong)
    }
  }

  test("exact parity with rational PAVA on random sequences") {
    val rnd = new scala.util.Random(47)
    (1 to 6).foreach { _ =>
      val cells = Seq.fill(8)((rnd.nextInt(20) + 1L,
        0L)).map { case (n, _) => (n, rnd.nextLong(n + 1)) }
      assert(fitOf(cells) == refPava(cells), s"cells $cells")
    }
  }

  test("already-monotone rates pass through untouched") {
    val cells = Seq((4L, 0L), (4L, 1L), (4L, 2L), (4L, 4L))
    assert(fitOf(cells) == Seq(0L, 250000L, 500000L, 1000000L))
  }

  test("one violation pools to the combined rate") {
    // rates (1, 0) on equal weight -> both 0.5
    assert(fitOf(Seq((2L, 2L), (2L, 0L))) == Seq(500000L, 500000L))
  }

  test("pooling is weight-aware") {
    // rates (1, 0) with weights (1, 3) -> pooled 1/4
    assert(fitOf(Seq((1L, 1L), (3L, 0L))) == Seq(250000L, 250000L))
  }

  test("output is nondecreasing for any input") {
    val rnd = new scala.util.Random(99)
    val cells = Seq.fill(12)((rnd.nextInt(9) + 1L, 0L))
      .map { case (n, _) => (n, rnd.nextLong(n + 1)) }
    val f = fitOf(cells)
    assert(f.zip(f.tail).forall { case (a, b) => a <= b }, s"fit $f")
  }

  test("registered q247 at sf0.001: per-year monotone lookup table") {
    val rows = Isotonic.orderFinishIsotonic(spark, "/root/testdata/sf0.001")
      .collect().sortBy(r => (r.getDouble(r.fieldIndex("forecast")),
        r.getInt(r.fieldIndex("yr"))))
    assert(rows.length >= 5) // one per order year
    val iso = rows.map(r => r.getDouble(r.fieldIndex("iso_rate")))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    iso.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }
}
