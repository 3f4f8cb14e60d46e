package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Sequential

/** Group-sequential monitor invariants (q153). Cross-engine parity
  * runs through the oracle gate; here: the OBF boundary shape, the
  * A/A no-crossing read on real data, and a planted effect that the
  * monitor catches at the right look. */
class SequentialSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  import spark.implicits._

  private def runOn(rows: Seq[(Long, String, String)]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-seq").toString
    rows.toDF("o_orderkey", "o_orderdate", "o_orderstatus")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS o_orderdate",
        "o_orderstatus")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Sequential.orderFinishMonitor(spark, tmp).collect()
  }

  test("boundary follows the OBF C/sqrt(t) shape and ends at C") {
    val out = Sequential.orderFinishMonitor(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length >= 3)
    val last = out.last
    assert(last.getDouble(last.fieldIndex("t_frac")) == 1.0)
    assert(math.abs(last.getDouble(last.fieldIndex("bound")) - 2.040) < 1e-9)
    // strictly decreasing boundary as information accrues
    val bounds = out.map(r => r.getDouble(r.fieldIndex("bound")))
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a > b })
  }

  test("A/A on real data: no look crosses, no decision") {
    val out = Sequential.orderFinishMonitor(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.forall(!_.getBoolean(out.head.fieldIndex("crossed"))))
    assert(out.forall(!_.getBoolean(out.head.fieldIndex("is_decision"))))
  }

  test("planted late-onset effect: decision fires at exactly one look") {
    // years 1992-1996; arms identical until 1995, then arm parity of
    // the ORDER KEY's hash drives a big finish-rate gap — the monitor
    // must not cross early and must flag exactly one decision look
    val rows = (1L to 4000L).map { k =>
      val year = 1992 + (k % 5).toInt
      val armB = graft.functions.Hashing.md5hex(s"${Sequential.Seed}:$k")
        .substring(0, 12)
      val inB = java.lang.Long.parseLong(armB, 16) % 2 == 1
      val fin =
        if (year < 1995) k % 2 == 0 // arm-independent 50%
        else if (inB) k % 10 != 0 // 90% finish
        else k % 10 < 2 // 20% finish
      (k, s"$year-06-01", if (fin) "F" else "O")
    }
    val out = runOn(rows)
    val decisions = out.filter(_.getBoolean(out.head.fieldIndex("is_decision")))
    assert(decisions.length == 1, s"decisions: ${decisions.length}")
    val dLook = decisions.head.getInt(decisions.head.fieldIndex("look"))
    assert(dLook >= 1995, s"decided at $dLook before the effect existed")
    // all pre-effect looks stayed inside the boundary
    assert(out.filter(_.getInt(out.head.fieldIndex("look")) < 1995)
      .forall(!_.getBoolean(out.head.fieldIndex("crossed"))))
  }
}
