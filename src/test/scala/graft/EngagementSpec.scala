package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.{Engagement, NewRepeat}

/** Engagement L28 (q308) + new/repeat split (q309): registered-shape
  * invariants and conservation identities on the generator corpus.
  * Value-level oracle equivalence runs through graft.Verify. */
class EngagementSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("L28: shape, bounds, share accounting") {
    val df = Engagement.l28Histogram(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("active_days", "n_users", "user_share_ppm"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getLong(0)
      assert(l >= 1L && l <= Engagement.WindowDays)
    }
    val shares = rows.map(_.getLong(2)).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }

  test("L28: user counts equal the distinct active users in the window") {
    import org.apache.spark.sql.functions._
    val total = Engagement.l28Histogram(spark, "/root/testdata/sf0.001")
      .agg(sum("n_users")).collect().head.getLong(0)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .filter("user_id IS NOT NULL AND ts IS NOT NULL")
      .selectExpr("user_id", "datediff(CAST(ts AS DATE), DATE'1970-01-01') AS d")
    val dmax = ev.agg(max("d")).collect().head.getInt(0)
    val direct = ev.filter(col("d") > dmax - Engagement.WindowDays)
      .select("user_id").distinct().count()
    assert(total == direct)
  }

  test("new/repeat: the first corpus month is 100% new; shares are sane") {
    val rows = NewRepeat.monthlyNewRepeat(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getString(0))
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getLong(first.fieldIndex("rev_repeat_cents")) == 0L)
    assert(first.getLong(first.fieldIndex("new_share_ppm")) == 1000000L)
    rows.foreach { r =>
      val s = r.getLong(r.fieldIndex("new_share_ppm"))
      assert(s >= 0L && s <= 1000000L)
    }
  }

  test("new/repeat: monthly revenue conserves against the plain rollup") {
    import org.apache.spark.sql.functions._
    val split = NewRepeat.monthlyNewRepeat(spark, "/root/testdata/sf0.001")
      .agg(sum(expr("rev_new_cents + rev_repeat_cents")))
      .collect().head.getLong(0)
    val direct = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter("o_custkey IS NOT NULL AND o_orderdate IS NOT NULL" +
        " AND o_totalprice IS NOT NULL")
      .agg(sum(expr("CAST(floor(o_totalprice * 1e2) AS BIGINT)")))
      .collect().head.getLong(0)
    assert(split == direct)
  }

  test("new/repeat: later months develop a repeat base") {
    val rows = NewRepeat.monthlyNewRepeat(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getString(0))
    // by the last year the repeat share must dominate (7-year corpus)
    val tail = rows.takeRight(6)
    assert(tail.forall(r =>
      r.getLong(r.fieldIndex("new_share_ppm")) < 500000L))
  }
}
