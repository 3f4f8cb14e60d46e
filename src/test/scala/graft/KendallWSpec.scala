package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.{Friedman, KendallW}

/** Kendall's W (q196): perfect agreement W = 1, perfect rotation
  * W = 0 with the classical r̄ = −1/(b−1) floor, and NULL
  * inheritance. Value-level oracle equivalence runs through
  * graft.Verify. */
class KendallWSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def w(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    KendallW.kendallW(Friedman.friedman(rows.toDF("b", "w", "v")))
      .collect().head
  }

  test("perfect agreement: W = 1, mean Spearman = 1") {
    val rows = for (b <- 1L to 3L; j <- 1L to 3L)
      yield (b, j, b * 1000L + j * 10L)
    val r = w(rows)
    assert(r.getDouble(r.fieldIndex("kendall_w")) == 1.0)
    assert(r.getDouble(r.fieldIndex("mean_spearman")) == 1.0)
  }

  test("perfect rotation: W = 0, mean Spearman = −1/(b−1)") {
    val rows = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      (2L, 1L, 20L), (2L, 2L, 30L), (2L, 3L, 10L),
      (3L, 1L, 30L), (3L, 2L, 10L), (3L, 3L, 20L))
    val r = w(rows)
    assert(r.getDouble(r.fieldIndex("kendall_w")) == 0.0)
    assert(r.getDouble(r.fieldIndex("mean_spearman")) == -0.5)
  }

  test("degenerate designs inherit the Friedman NULL") {
    val rows = for (b <- 1L to 3L; j <- 1L to 3L) yield (b, j, 7L)
    val r = w(rows)
    assert(r.isNullAt(r.fieldIndex("kendall_w")))
    assert(r.isNullAt(r.fieldIndex("mean_spearman")))
  }
}
