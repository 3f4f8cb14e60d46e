package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Conformal

/** Split-conformal invariants (q149). Cross-engine value parity runs
  * through the oracle gate; here: the finite-sample coverage property
  * the method exists for, exact-order-statistic parity with a driver
  * recompute, and the CellGuard. */
class ConformalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.01"

  lazy val out = Conformal.orderPriceConformal(spark, dir).collect()

  test("every group reports a finite interval and ~90% eval coverage") {
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getString(0)
      assert(!r.isNullAt(r.fieldIndex("qhat_d")), s"$g: infinite interval")
      val cov = r.getDouble(r.fieldIndex("coverage"))
      // finite-sample guarantee: ≥ 1−α in expectation; the eval split
      // is large enough here that the realized rate sits near 0.9
      assert(cov > 0.85 && cov < 0.97, s"$g coverage $cov")
    }
  }

  test("qhat is the exact ceil((n_cal+1)*0.9)-th smallest dollar score") {
    import graft.functions.Hashing
    val rows = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull && col("o_orderpriority").isNotNull)
      .select(col("o_orderpriority").as("g"),
        expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("yc"),
        (Hashing.hash48(Conformal.Seed, col("o_orderkey").cast("string")) % 10)
          .as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byG = rows.groupBy(_._1)
    val want = byG.map { case (g, rs) =>
      val train = rs.filter(_._3 < 4).map(_._2)
      val yhat = train.sum / train.length // floor div, positive cents
      val scores = rs.filter(r => r._3 >= 4 && r._3 <= 6)
        .map(r => math.abs(r._2 - yhat) / 100).sorted
      val rank = (9 * (scores.length + 1) + 9) / 10
      g -> scores(rank.toInt - 1)
    }
    val got = out.map(r => r.getString(0) -> r.getLong(r.fieldIndex("qhat_d"))).toMap
    assert(got == want, s"got $got want $want")
  }

  test("cell guard fires when the score domain is effectively continuous") {
    val e = intercept[Exception] {
      Conformal.orderPriceConformal(spark, dir, maxCells = 8).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("orderPriceConformal") && msgs.contains("maxCells"))
  }

  test("splits are disjoint, deterministic, and cover every row") {
    val n = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull && col("o_orderpriority").isNotNull)
      .count()
    val parts = out.map(r => r.getLong(r.fieldIndex("n_train")) +
      r.getLong(r.fieldIndex("n_cal")) + r.getLong(r.fieldIndex("n_eval"))).sum
    assert(parts == n, s"splits cover $parts of $n rows")
  }
}
