package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.PriceVolumeMix

/** Price–volume–mix (q302): hand-computed single-item bridges, the
  * additivity identity within cent-floor tolerance, new/lost
  * accounting, and the registered shape. Value-level oracle
  * equivalence runs through graft.Verify. */
class PriceVolumeMixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** cells: (item, period, q, r_cents) in one group. */
  private def run(cells: Seq[(Long, Int, Long, Long)]) = {
    import spark.implicits._
    PriceVolumeMix.bridge(
      cells.map { case (i, p, q, r) => ("g", i, p, q, r) }
        .toDF("g", "item", "period", "q", "r").repartition(4))
      .collect().head
  }

  test("pure volume move: price effect zero") {
    // 10 units @ $2 → 15 units @ $2 (same price)
    val r = run(Seq((1L, 0, 10L, 2000L), (1L, 1, 15L, 3000L)))
    assert(r.getLong(r.fieldIndex("volume_cents")) == 1000L)
    assert(r.getLong(r.fieldIndex("price_cents")) == 0L)
    assert(r.getLong(r.fieldIndex("cross_cents")) == 0L)
  }

  test("pure price move: volume effect zero") {
    // 10 units @ $2 → 10 units @ $2.50
    val r = run(Seq((1L, 0, 10L, 2000L), (1L, 1, 10L, 2500L)))
    assert(r.getLong(r.fieldIndex("volume_cents")) == 0L)
    assert(r.getLong(r.fieldIndex("price_cents")) == 500L)
  }

  test("joint move carries an honest cross term and the identity holds") {
    // 10 @ $2 → 20 @ $3: Δ = 4000; vol = 10·200 = 2000,
    // price = 10·100 = 1000, cross = 10·100 = 1000
    val r = run(Seq((1L, 0, 10L, 2000L), (1L, 1, 20L, 6000L)))
    assert(r.getLong(r.fieldIndex("volume_cents")) == 2000L)
    assert(r.getLong(r.fieldIndex("price_cents")) == 1000L)
    assert(r.getLong(r.fieldIndex("cross_cents")) == 1000L)
    val delta = r.getLong(2) - r.getLong(1)
    assert(delta == 2000L + 1000L + 1000L)
  }

  test("entering and exiting items land in new/lost, not the effects") {
    val r = run(Seq((1L, 0, 5L, 1000L), (2L, 1, 3L, 900L)))
    assert(r.getLong(r.fieldIndex("new_cents")) == 900L)
    assert(r.getLong(r.fieldIndex("lost_cents")) == -1000L)
    assert(r.getLong(r.fieldIndex("volume_cents")) == 0L)
  }

  test("registered bridge: additivity within one cent per matched item") {
    val df = PriceVolumeMix.brandRevenueBridge(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val delta = r.getLong(r.fieldIndex("rev1_cents")) -
        r.getLong(r.fieldIndex("rev0_cents"))
      val explained = r.getLong(r.fieldIndex("volume_cents")) +
        r.getLong(r.fieldIndex("price_cents")) +
        r.getLong(r.fieldIndex("cross_cents")) +
        r.getLong(r.fieldIndex("new_cents")) +
        r.getLong(r.fieldIndex("lost_cents"))
      // three floored terms per matched item → residual < 3 cents/item;
      // brands have ≤ ~tens of matched parts at sf0.001
      assert(math.abs(delta - explained) < 1000L,
        s"brand ${r.getString(0)}: delta $delta explained $explained")
    }
  }
}
