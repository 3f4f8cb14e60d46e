package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.GrowthAccounting

/** Growth accounting (q303): a hand-built user history exercising all
  * four classes, the ledger identity, churn-at-the-edge handling, and
  * the registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class GrowthAccountingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def run(cells: Seq[(Long, Long)]) = {
    import spark.implicits._
    GrowthAccounting.ledger(cells.toDF("u", "m").repartition(4))
      .collect().map(r => r.getLong(r.fieldIndex("m")) -> r).toMap
  }

  test("all four classes on a planted history") {
    // u1: months 1,2,4  (new@1, retained@2, gap, resurrected@4)
    // u2: months 1      (new@1, churned@2)
    // u3: months 2,3    (new@2, retained@3)
    val m = run(Seq((1L, 1L), (1L, 2L), (1L, 4L),
      (2L, 1L), (3L, 2L), (3L, 3L)))
    assert(m(1L).getLong(m(1L).fieldIndex("n_new")) == 2L)
    assert(m(2L).getLong(m(2L).fieldIndex("n_retained")) == 1L) // u1
    assert(m(2L).getLong(m(2L).fieldIndex("n_new")) == 1L)      // u3
    assert(m(2L).getLong(m(2L).fieldIndex("n_churned")) == 1L)  // u2
    assert(m(3L).getLong(m(3L).fieldIndex("n_churned")) == 1L)  // u1 off
    assert(m(4L).getLong(m(4L).fieldIndex("n_resurrected")) == 1L)
    // u3 drops after 3 → churned@4
    assert(m(4L).getLong(m(4L).fieldIndex("n_churned")) == 1L)
  }

  test("ledger identity: MAU_m = MAU_prev + new + resurrected - churned") {
    val cells = for {
      u <- 1L to 40L
      m <- 1L to 8L
      if (u + m) % 3 != 0 // deterministic on/off pattern with gaps
    } yield (u, m)
    val led = run(cells)
    val months = led.keys.toSeq.sorted
    months.sliding(2).foreach {
      case Seq(p, c) if c == p + 1 =>
        val (rp, rc) = (led(p), led(c))
        val expect = rp.getLong(rp.fieldIndex("mau")) +
          rc.getLong(rc.fieldIndex("n_new")) +
          rc.getLong(rc.fieldIndex("n_resurrected")) -
          rc.getLong(rc.fieldIndex("n_churned"))
        assert(rc.getLong(rc.fieldIndex("mau")) == expect, s"month $c")
      case _ =>
    }
  }

  test("mau partitions into the three active classes") {
    val cells = (1L to 30L).flatMap(u => (1L to 5L)
      .filter(m => (u * m) % 4 != 1).map(m => (u, m)))
    run(cells).values.foreach { r =>
      assert(r.getLong(r.fieldIndex("mau")) ==
        r.getLong(r.fieldIndex("n_new")) +
          r.getLong(r.fieldIndex("n_retained")) +
          r.getLong(r.fieldIndex("n_resurrected")))
    }
  }

  test("no churn is booked past the observable horizon") {
    val m = run(Seq((1L, 1L), (2L, 1L), (2L, 2L)))
    // month 3 does not exist: u2's eventual churn is not invented
    assert(!m.contains(3L))
    assert(m(2L).getLong(m(2L).fieldIndex("n_churned")) == 1L) // u1
  }

  test("registered shape: calendar ledger rows with yyyy-MM display") {
    val df = GrowthAccounting.orderGrowthLedger(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("month", "mau", "n_new", "n_retained",
      "n_resurrected", "n_churned"))
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).matches("\\d{4}-\\d{2}")))
  }
}
