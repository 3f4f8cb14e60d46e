package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.FkAudit

/** FK audit (q288): planted orphans and null FKs are counted
  * separately, clean edges read zero, and the registered star audit.
  * Value-level oracle equivalence runs through graft.Verify. */
class FkAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def one(children: Seq[Option[Long]], parents: Seq[Long]) = {
    import spark.implicits._
    FkAudit.auditOne(
      children.toDF("fk").repartition(4),
      parents.toDF("pk").repartition(4), "t")
      .collect().head
  }

  test("orphans and null FKs are distinct defects, counted separately") {
    val r = one(
      Seq(Some(1L), Some(2L), Some(99L), None, Some(1L), Some(98L), None),
      Seq(1L, 2L, 3L))
    assert(r.getLong(r.fieldIndex("n_child")) == 5L)    // non-null FKs
    assert(r.getLong(r.fieldIndex("n_null_fk")) == 2L)
    assert(r.getLong(r.fieldIndex("n_orphans")) == 2L)  // 99, 98
    assert(r.getLong(r.fieldIndex("orphan_ppm")) == 400000L)
  }

  test("clean edge: zero orphans, zero ppm") {
    val r = one(Seq(Some(1L), Some(2L), Some(2L)), Seq(1L, 2L))
    assert(r.getLong(r.fieldIndex("n_orphans")) == 0L)
    assert(r.getLong(r.fieldIndex("orphan_ppm")) == 0L)
  }

  test("all-null child column: ppm NULL (no resolvable rows)") {
    val r = one(Seq(None, None), Seq(1L))
    assert(r.getLong(r.fieldIndex("n_child")) == 0L)
    assert(r.isNullAt(r.fieldIndex("orphan_ppm")))
  }

  test("registered star audit: five edges, all clean on the generator") {
    val df = FkAudit.starSchemaFkAudit(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("relationship", "n_child", "n_null_fk",
      "n_orphans", "orphan_ppm"))
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSet == Set(
      "lineitem->orders", "lineitem->part", "lineitem->supplier",
      "orders->customer", "customer->nation"))
    rows.foreach(r => assert(r.getLong(r.fieldIndex("n_child")) > 0L))
  }
}
