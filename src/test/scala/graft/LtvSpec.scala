package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Ltv

/** Cohort LTV (q290): registered-shape invariants — cumulative
  * monotonicity per cohort, cohort sizing, age-0 completeness, and the
  * display contract. Value-level oracle equivalence runs through
  * graft.Verify. */
class LtvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  lazy val rows = Ltv.cohortLtv(spark, "/root/testdata/sf0.001").collect()

  test("shape and display contract") {
    assert(rows.nonEmpty)
    val cols = Ltv.cohortLtv(spark, "/root/testdata/sf0.001").columns.toSeq
    assert(cols == Seq("cohort_month", "age_months", "n_cohort",
      "rev_cents", "cum_ltv"))
    // cohort_month is yyyy-MM
    assert(rows.forall(_.getString(0).matches("\\d{4}-\\d{2}")))
  }

  test("every cohort starts at age 0 (the acquisition month has revenue)") {
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (c, rs) =>
      assert(rs.map(_.getLong(1)).min == 0L, s"cohort $c")
    }
  }

  test("cum_ltv is non-decreasing in age within each cohort") {
    rows.groupBy(_.getString(0)).foreach { case (c, rs) =>
      val curve = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        s"cohort $c")
    }
  }

  test("age-0 LTV is at least one order's value per member: positive") {
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getDouble(4) > 0.0)
      assert(r.getLong(2) > 0L)
      assert(r.getLong(3) > 0L)
    }
  }

  test("cohort size is constant across the cohort's own rows") {
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length == 1)
    }
  }
}
