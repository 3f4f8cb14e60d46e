package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.{Jonckheere, KruskalWallis}

/** Kruskal–Wallis H (q176): the q98 hand frame on ranks, the
  * tie-corrected hand case, degenerate guards, and the JT-vs-KW
  * division of labor. Value-level oracle equivalence runs through
  * graft.Verify. */
class KruskalWallisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def kw(rows: Seq[(Long, Long)], grid: Long = 1L) = {
    import spark.implicits._
    KruskalWallis.kruskalWallis(rows.toDF("w", "v").repartition(3), grid)
      .collect().head
  }

  test("hand case {1,2,3|4,5,6|7,8,9}: H = 7.2 (the q98 frame on ranks)") {
    val r = kw(Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L),
      (3L, 7L), (3L, 8L), (3L, 9L)))
    assert(r.getLong(r.fieldIndex("n_total")) == 9L)
    assert(r.getLong(r.fieldIndex("k_levels")) == 3L)
    assert(r.getDouble(r.fieldIndex("h_stat")) == 7.2)
    // χ²₂ upper tail of 7.2 = e^{-3.6} ≈ 0.0273; W–H approx within a few 1e-3
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p > 0.02 && p < 0.04, s"p=$p")
  }

  test("tie-corrected hand case {1,1|2,2}: H = 2.4/0.8 = 3.0") {
    val r = kw(Seq((1L, 1L), (1L, 1L), (2L, 2L), (2L, 2L)))
    assert(r.getDouble(r.fieldIndex("h_stat")) == 3.0)
  }

  test("identical distributions: H ≈ 0, p ≈ 1") {
    val rows = for (w <- 1L to 3L; v <- 1L to 4L) yield (w, v)
    val r = kw(rows)
    assert(math.abs(r.getDouble(r.fieldIndex("h_stat"))) < 1e-9)
    assert(r.getDouble(r.fieldIndex("p_value")) > 0.95)
  }

  test("all values tied: correction hits 0 → NULL H") {
    val r = kw(Seq((1L, 5L), (1L, 5L), (2L, 5L), (2L, 5L)))
    assert(r.isNullAt(r.fieldIndex("h_stat")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("single group: NULL (no between-group question to ask)") {
    val r = kw(Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    assert(r.isNullAt(r.fieldIndex("h_stat")))
  }

  test("division of labor: non-monotone separation lights KW but not JT") {
    // middle level is the outlier: 1:{1..5}, 2:{101..105}, 3:{6..10}
    val rows = (1L to 5L).map(i => (1L, i)) ++
      (1L to 5L).map(i => (2L, 100L + i)) ++
      (1L to 5L).map(i => (3L, 5L + i))
    import spark.implicits._
    val kwP = kw(rows).getDouble(4)
    val jtR = Jonckheere.jonckheere(rows.toDF("w", "v")).collect().head
    val jtP = jtR.getDouble(jtR.fieldIndex("p_value"))
    assert(kwP < 0.01, s"KW should fire: $kwP")
    assert(jtP > 10.0 * kwP && jtP > 0.1,
      s"JT should stay far from firing (non-monotone): $jtP vs KW $kwP")
  }

  test("registered q176 at sf0.001: 5 levels, sane H/p") {
    val r = KruskalWallis.priorityValueKw(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("k_levels")) == 5L)
    if (!r.isNullAt(r.fieldIndex("p_value"))) {
      val p = r.getDouble(r.fieldIndex("p_value"))
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
