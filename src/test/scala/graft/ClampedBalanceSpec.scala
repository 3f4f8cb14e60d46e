package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.ClampedBalance

/** Clamped balance (q301): the reflection identity vs a direct
  * sequential recurrence, clamp behavior, and the registered shape.
  * Value-level oracle equivalence runs through graft.Verify. */
class ClampedBalanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def run(flows: Seq[Long]) = {
    import spark.implicits._
    ClampedBalance.clampedSummary(
      flows.zipWithIndex.map { case (n, d) => ("k", d.toLong, n) }
        .toDF("k", "d", "net").repartition(4))
      .collect().head
  }

  /** The recurrence the window identity must reproduce. */
  private def direct(flows: Seq[Long]): Seq[Long] =
    flows.scanLeft(0L) { case (b, d) => math.max(0L, b + d) }.tail

  test("window identity equals the sequential recurrence") {
    val flows = Seq(3L, -5L, 4L, -1L, -9L, 12L, -2L, -2L, -2L, 5L)
    val bs = direct(flows)
    val r = run(flows)
    assert(r.getLong(r.fieldIndex("final_balance")) == bs.last)
    assert(r.getLong(r.fieldIndex("max_balance")) == bs.max)
    assert(r.getLong(r.fieldIndex("zero_days")) == bs.count(_ == 0L))
  }

  test("never negative: a deep deficit clamps to zero, not debt") {
    val r = run(Seq(-100L, 5L))
    assert(r.getLong(r.fieldIndex("final_balance")) == 5L)
    assert(r.getLong(r.fieldIndex("zero_days")) == 1L)
  }

  test("pure inflow: the clamp never engages (plain cumsum)") {
    val flows = Seq(2L, 3L, 1L, 4L)
    val r = run(flows)
    assert(r.getLong(r.fieldIndex("final_balance")) == 10L)
    assert(r.getLong(r.fieldIndex("zero_days")) == 0L)
  }

  test("registered shape: stride-probed parts, balances non-negative") {
    val df = ClampedBalance.partStockBalance(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("l_partkey", "n_days", "final_balance",
      "max_balance", "zero_days"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("l_partkey")) %
        ClampedBalance.ProbeStride == 0)
      assert(r.getLong(r.fieldIndex("final_balance")) >= 0L)
      assert(r.getLong(r.fieldIndex("max_balance")) >=
        r.getLong(r.fieldIndex("final_balance")))
    }
  }
}
