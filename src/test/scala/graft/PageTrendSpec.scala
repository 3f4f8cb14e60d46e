package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.PageTrend

/** Page's L trend test (q254): the exact hand moments (z = ±2 on
  * perfect 2-block order), tie handling through doubled midranks,
  * the all-tied degenerate, incomplete-block accounting, directional
  * power vs Friedman's undirected χ², and the registered cells.
  * Value-level oracle equivalence runs through graft.Verify. */
class PageTrendSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(cells: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    PageTrend.pageL(cells.toDF("b", "w", "v")).collect().head
  }

  test("perfect 2-block agreement: L = 28, z = 2.0 exactly") {
    val cells = for (b <- 1L to 2L; j <- 1L to 3L) yield (b, j, j * 10)
    val row = fit(cells.toSeq)
    assert(row.getDouble(row.fieldIndex("l_stat")) == 28.0)
    assert(row.getDouble(row.fieldIndex("z")) == 2.0)
    assert(row.getDouble(row.fieldIndex("p_value")) < 0.03)
  }

  test("perfect reversal is antisymmetric: z = -2.0") {
    val cells = for (b <- 1L to 2L; j <- 1L to 3L) yield (b, j, -j * 10)
    val row = fit(cells.toSeq)
    assert(row.getDouble(row.fieldIndex("z")) == -2.0)
    assert(row.getDouble(row.fieldIndex("p_value")) > 0.97)
  }

  test("an all-tied block contributes E exactly and zero variance") {
    // block 3 all-tied: L moves by its E, z unchanged from 2 blocks
    val base = (for (b <- 1L to 2L; j <- 1L to 3L) yield (b, j, j * 10)).toSeq
    val tied = base ++ Seq((3L, 1L, 7L), (3L, 2L, 7L), (3L, 3L, 7L))
    val r2 = fit(base)
    val r3 = fit(tied)
    assert(r3.getDouble(r3.fieldIndex("z")) == r2.getDouble(r2.fieldIndex("z")))
    // tied block's midranks are all (k+1) -> L gains b=1 worth of E = 12
    assert(r3.getDouble(r3.fieldIndex("l_stat")) ==
      r2.getDouble(r2.fieldIndex("l_stat")) + 12.0)
  }

  test("all blocks tied: degenerate NULL, never a division error") {
    val cells = for (b <- 1L to 3L; j <- 1L to 4L) yield (b, j, 5L)
    val row = fit(cells.toSeq)
    assert(row.isNullAt(row.fieldIndex("z")))
    assert(row.isNullAt(row.fieldIndex("p_value")))
  }

  test("incomplete blocks are dropped and counted") {
    val full = (for (b <- 1L to 2L; j <- 1L to 3L) yield (b, j, j * 10)).toSeq
    val withPartial = full ++ Seq((9L, 1L, 4L), (9L, 2L, 8L)) // missing w=3
    val row = fit(withPartial)
    assert(row.getLong(row.fieldIndex("n_blocks")) == 2L)
    assert(row.getLong(row.fieldIndex("b_dropped")) == 1L)
    assert(row.getDouble(row.fieldIndex("z")) == 2.0) // partial invisible
  }

  test("directional power: a consistent monotone trend beats Friedman" +
    " where a non-monotone but consistent ordering does not fire Page") {
    // consistent but hump-shaped ordering (2,3,1): Friedman fires,
    // Page (monotone alternative) stays small
    val hump = (for (b <- 1L to 6L) yield Seq(
      (b, 1L, 20L + b), (b, 2L, 30L + b), (b, 3L, 10L + b))).flatten
    val rowP = fit(hump)
    // hump reads z = -sqrt(3) (a weak deficit), far from significance
    assert(math.abs(rowP.getDouble(rowP.fieldIndex("z"))) < 1.96)
    assert(rowP.getDouble(rowP.fieldIndex("p_value")) > 0.05)
    // and a consistent monotone trend fires Page strongly
    val mono = (for (b <- 1L to 6L) yield Seq(
      (b, 1L, 10L + b), (b, 2L, 20L + b), (b, 3L, 30L + b))).flatten
    val rowM = fit(mono)
    assert(rowM.getDouble(rowM.fieldIndex("z")) > 3.0)
    assert(rowM.getDouble(rowM.fieldIndex("p_value")) < 0.001)
  }

  test("registered q254 at sf0.001: the q177 cells, directed") {
    val row = PageTrend.priorityYearPage(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(row.fieldIndex("k_levels")) == 5L)
    assert(row.getLong(row.fieldIndex("n_blocks")) >= 5L)
    val p = row.getDouble(row.fieldIndex("p_value"))
    assert(p >= 0.0 && p <= 1.0)
  }
}
