package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Theil

/** Theil T decomposition (q187): perfect-equality zero, pure-between
  * and pure-within extremes, a hand-computed index, the additive
  * identity, and non-positive exclusion. Value-level oracle
  * equivalence runs through graft.Verify. */
class TheilSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def t(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    Theil.theil(rows.toDF("g", "x").repartition(3)).collect().head
  }

  test("perfect equality: T = 0 exactly on the snapped grid") {
    val r = t(Seq((1L, 50L), (1L, 50L), (2L, 50L), (2L, 50L)))
    assert(r.getDouble(r.fieldIndex("theil_total")) == 0.0)
    assert(r.getDouble(r.fieldIndex("theil_between")) == 0.0)
    assert(r.getDouble(r.fieldIndex("theil_within")) == 0.0)
  }

  test("equal within, unequal between: between_share = 1") {
    val r = t(Seq((1L, 10L), (1L, 10L), (2L, 1000L), (2L, 1000L)))
    assert(r.getDouble(r.fieldIndex("theil_within")) == 0.0)
    assert(r.getDouble(r.fieldIndex("theil_between")) > 0.5)
    assert(r.getDouble(r.fieldIndex("between_share")) == 1.0)
  }

  test("equal group means, unequal within: between = 0") {
    val r = t(Seq((1L, 1L), (1L, 99L), (2L, 50L), (2L, 50L)))
    assert(r.getDouble(r.fieldIndex("theil_between")) == 0.0)
    assert(r.getDouble(r.fieldIndex("theil_within")) > 0.1)
  }

  test("hand case {1, 3}: T = ¼·ln(½) + ¾·ln(3/2) ≈ 0.130812") {
    val r = t(Seq((1L, 1L), (1L, 3L)))
    val expected = 0.25 * math.log(0.5) + 0.75 * math.log(1.5)
    assert(math.abs(r.getDouble(r.fieldIndex("theil_total")) - expected)
      < 2e-6)
  }

  test("the decomposition adds up on the snapped grid") {
    val r = t(Seq((1L, 1L), (1L, 9L), (2L, 5L), (2L, 45L), (3L, 100L)))
    val (b, w, tot) = (r.getDouble(r.fieldIndex("theil_between")),
      r.getDouble(r.fieldIndex("theil_within")),
      r.getDouble(r.fieldIndex("theil_total")))
    assert(math.abs(tot - (b + w)) < 2e-6)
    assert(tot > 0.0)
  }

  test("non-positive values are excluded and counted") {
    val withJunk = t(Seq((1L, 1L), (1L, 3L), (1L, 0L), (1L, -7L)))
    assert(withJunk.getLong(withJunk.fieldIndex("n_excluded")) == 2L)
    assert(withJunk.getLong(withJunk.fieldIndex("n_entities")) == 2L)
    val clean = t(Seq((1L, 1L), (1L, 3L)))
    assert(withJunk.getDouble(withJunk.fieldIndex("theil_total")) ==
      clean.getDouble(clean.fieldIndex("theil_total")))
  }
}
