package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.OrdinalAssoc

/** Goodman–Kruskal gamma + Somers' D (q248): brute-force pair parity,
  * perfect concordance/reversal, tie semantics (gamma ignores, D
  * conditions), the 2·AUC−1 identity on a binary outcome, and the
  * all-tied NULL. Value-level oracle equivalence runs through
  * graft.Verify. */
class OrdinalAssocSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(xs: Seq[(Long, Long)]) = {
    import spark.implicits._
    OrdinalAssoc.gammaSomers(xs.toDF("va", "vb")).collect().head
  }

  /** Brute-force reference over all pairs. */
  private def ref(xs: Seq[(Long, Long)]): (Double, Double, Double) = {
    var (c, d, tiedX, tiedY) = (0L, 0L, 0L, 0L)
    for (i <- xs.indices; j <- i + 1 until xs.length) {
      val ((x1, y1), (x2, y2)) = (xs(i), xs(j))
      val p = (x1 - x2).sign * (y1 - y2).sign
      if (p > 0) c += 1 else if (p < 0) d += 1
      if (x1 == x2) tiedX += 1
      if (y1 == y2) tiedY += 1
    }
    val n0 = xs.length.toLong * (xs.length - 1) / 2
    ((c - d).toDouble / (c + d),
      (c - d).toDouble / (n0 - tiedX),
      (c - d).toDouble / (n0 - tiedY))
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("brute-force pair parity on random tied data") {
    val rnd = new scala.util.Random(248)
    (1 to 4).foreach { _ =>
      val xs = Seq.fill(40)((rnd.nextInt(4).toLong, rnd.nextInt(5).toLong))
      val row = fit(xs)
      val (g, dyx, dxy) = ref(xs)
      assert(row.getDouble(row.fieldIndex("gamma")) == r6(g))
      assert(row.getDouble(row.fieldIndex("somers_d_yx")) == r6(dyx))
      assert(row.getDouble(row.fieldIndex("somers_d_xy")) == r6(dxy))
    }
  }

  test("perfect concordance reads 1 everywhere; reversal -1") {
    val up = (1L to 10L).map(i => (i, i * 3))
    val rowUp = fit(up)
    Seq("gamma", "somers_d_yx", "somers_d_xy").foreach(cn =>
      assert(rowUp.getDouble(rowUp.fieldIndex(cn)) == 1.0, cn))
    val down = (1L to 10L).map(i => (i, -i))
    val rowDown = fit(down)
    Seq("gamma", "somers_d_yx", "somers_d_xy").foreach(cn =>
      assert(rowDown.getDouble(rowDown.fieldIndex(cn)) == -1.0, cn))
  }

  test("gamma ignores ties where D pays for them") {
    // two x-levels, y tied within level: concordant across levels only
    val xs = Seq((1L, 5L), (1L, 5L), (2L, 9L), (2L, 9L))
    val row = fit(xs)
    // C = 4, D = 0, no mixed pairs untied-x-tied-y beyond the 2+2
    assert(row.getDouble(row.fieldIndex("gamma")) == 1.0)
    // d_yx = 2S/(n(n-1) - ta2) = 8/(12 - 4) = 1.0 (x-tied pairs excluded)
    assert(row.getDouble(row.fieldIndex("somers_d_yx")) == 1.0)
    // d_xy = 8/(12 - 4) = 1.0 too here; make them diverge:
    val xs2 = Seq((1L, 5L), (1L, 6L), (2L, 9L), (2L, 9L))
    val row2 = fit(xs2)
    val (g2, dyx2, dxy2) = ref(xs2)
    assert(row2.getDouble(row2.fieldIndex("gamma")) == r6(g2))
    assert(row2.getDouble(row2.fieldIndex("somers_d_yx")) == r6(dyx2))
    assert(row2.getDouble(row2.fieldIndex("somers_d_xy")) == r6(dxy2))
    assert(dyx2 != dxy2) // the asymmetry is real on this data
  }

  test("binary outcome: d_yx equals 2*AUC - 1") {
    // score va predicts binary vb; AUC by hand over pos/neg pairs
    val xs = Seq((10L, 1L), (8L, 1L), (7L, 0L), (5L, 1L), (3L, 0L),
      (2L, 0L), (1L, 0L))
    val pos = xs.filter(_._2 == 1L).map(_._1)
    val neg = xs.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.size * neg.size)
    // the AUC identity conditions on pairs with DIFFERENT outcomes
    // (untied y) — that is d_xy here (va = score, vb = outcome); it is
    // what R Hmisc::somers2 calls Dxy
    val row2 = fit(xs)
    assert(row2.getDouble(row2.fieldIndex("somers_d_xy")) == r6(2 * auc - 1))
  }

  test("all-tied columns are NULL, not an error") {
    val row = fit(Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    assert(row.isNullAt(row.fieldIndex("gamma")) ||
      row.getDouble(row.fieldIndex("gamma")) == 0.0)
    assert(row.isNullAt(row.fieldIndex("somers_d_yx")))
  }

  test("registered q248 at sf0.001: one row, measures in [-1, 1]") {
    val row = OrdinalAssoc.discountQuantity(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(row.fieldIndex("n_rows")) > 0)
    Seq("gamma", "somers_d_yx", "somers_d_xy").foreach { cn =>
      val v = row.getDouble(row.fieldIndex(cn))
      assert(v >= -1.0 && v <= 1.0, s"$cn $v")
    }
  }
}
