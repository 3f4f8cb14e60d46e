package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.ZorderAudit

/** Z-order audit (q298): the locality contract (top-8-bit buckets
  * bound both dimension spans by 2¹²), bucket-range sanity, and
  * coverage. The cross-engine interleave equivalence is the oracle
  * statement itself (graft.Verify). */
class ZorderAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  lazy val rows = ZorderAudit.orderZorderAudit(spark, "/root/testdata/sf0.001")
    .collect()

  test("locality contract: every bucket's spans are bounded by 2^12") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("price_span")) < 4096L)
      assert(r.getLong(r.fieldIndex("date_span")) < 4096L)
    }
  }

  test("buckets live in the top-8-bit range and partition all rows") {
    rows.foreach { r =>
      val b = r.getLong(r.fieldIndex("z_bucket"))
      assert(b >= 0L && b < 256L)
    }
    val total = rows.map(_.getLong(1)).sum
    val direct = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter("o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL")
      .count()
    assert(total == direct)
  }

  test("the layout uses many buckets (clustering, not collapse)") {
    assert(rows.length > 16)
  }
}
