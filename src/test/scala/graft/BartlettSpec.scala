package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Bartlett

/** Bartlett (q304): a direct double-precision cross-check, the
  * unequal-variance rejection, equal-variance acceptance, degenerate
  * guards, and the registered shape. Value-level oracle equivalence
  * runs through graft.Verify. */
class BartlettSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def bt(groups: Seq[Seq[Long]]) = {
    import spark.implicits._
    val rows = groups.zipWithIndex.flatMap { case (xs, g) =>
      xs.map(x => (s"g$g", x))
    }
    Bartlett.bartlett(rows.toDF("g", "x").repartition(4)).collect().head
  }

  /** Textbook B on raw doubles. */
  private def direct(groups: Seq[Seq[Long]]): Double = {
    val k = groups.size
    val ns = groups.map(_.size.toDouble)
    val vs = groups.map { xs =>
      val n = xs.size.toDouble
      val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / (n - 1)
    }
    val nTot = ns.sum
    val sp2 = groups.zip(vs).map { case (xs, v) => (xs.size - 1) * v }.sum /
      (nTot - k)
    val num = (nTot - k) * math.log(sp2) -
      ns.zip(vs).map { case (n, v) => (n - 1) * math.log(v) }.sum
    val c = 1.0 + (ns.map(n => 1.0 / (n - 1)).sum - 1.0 / (nTot - k)) /
      (3.0 * (k - 1))
    num / c
  }

  test("B matches the direct computation on mixed-spread groups") {
    val groups = Seq(
      (0 until 40).map(i => 100L + (i % 9) - 4),
      (0 until 35).map(i => 100L + 3 * ((i % 9) - 4)),
      (0 until 45).map(i => 100L + 2 * ((i % 7) - 3)))
    val r = bt(groups.map(_.map(_.toLong)))
    // cent-grid SS floors vs raw doubles: B ≈ 40 here, so 0.1 is a
    // ~0.25% relative band
    assert(math.abs(r.getDouble(r.fieldIndex("b_stat")) -
      direct(groups.map(_.map(_.toLong)))) < 0.1)
    assert(r.getDouble(r.fieldIndex("p_value")) < 0.05) // 3x spread: reject
  }

  test("equal spreads: B small, p large") {
    val groups = (0 until 3).map(g =>
      (0 until 50).map(i => 200L + ((i + g) % 11) - 5).map(_.toLong))
    val r = bt(groups)
    assert(r.getDouble(r.fieldIndex("b_stat")) < 2.0)
    assert(r.getDouble(r.fieldIndex("p_value")) > 0.2)
  }

  test("a constant group (zero variance) yields NULL, not a ln error") {
    val r = bt(Seq(Seq.fill(10)(5L), (0 until 10).map(i => (i % 3).toLong)))
    assert(r.isNullAt(r.fieldIndex("b_stat")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("registered shape: the q182 frame, one row") {
    val df = Bartlett.priorityValueBartlett(spark, "/root/testdata/sf0.001")
    val r = df.collect().head
    assert(df.columns.toSeq ==
      Seq("n_rows", "k_groups", "b_stat", "z_wh", "p_value"))
    assert(r.getLong(r.fieldIndex("k_groups")) == 5L)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p >= 0.0 && p <= 1.0)
  }
}
