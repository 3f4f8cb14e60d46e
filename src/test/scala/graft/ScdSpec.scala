package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Scd

/** SCD-2 compression invariants. Value-level equivalence vs the DuckDB
  * window twin runs through graft.Verify + tools/verify_local.py. */
class ScdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  test("change stream compresses to intervals; exactly one current row per key") {
    import spark.implicits._
    val obs = Seq(
      // key 1: A A B A  -> versions A[t1,t3) B[t3,t4) A[t4,∞)
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "A", ts("2024-01-02 00:00:00"), 2L),
      (1L, "B", ts("2024-01-03 00:00:00"), 3L),
      (1L, "A", ts("2024-01-04 00:00:00"), 4L),
      // key 2: single observation -> one open version
      (2L, "X", ts("2024-01-01 12:00:00"), 5L)
    ).toDF("k", "state", "t", "tie")
    val got = Scd.scd2(obs, "k", "state", "t", "tie")
      .select("k", "state", "valid_from", "valid_to", "version", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getInt(4), r.getBoolean(5)))
      .toSet
    assert(got == Set(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 1, false),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), 2, false),
      (1L, "A", ts("2024-01-04 00:00:00"), None, 3, true),
      (2L, "X", ts("2024-01-01 12:00:00"), None, 1, true)))
  }

  test("q66 invariants on real data: contiguous, gap-free, one current per user") {
    val out = Scd.userStateHistory(spark, dir).cache()
    val users = out.select("user_id").distinct().count()
    assert(out.filter(col("is_current")).count() == users)
    // each version's valid_to equals the next version's valid_from
    val joined = out.as("a").join(out.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.version") + 1 === col("b.version"))
    assert(joined.filter(col("a.valid_to") =!= col("b.valid_from")).count() == 0)
    assert(joined.filter(col("a.state") === col("b.state")).count() == 0)
    out.unpersist()
  }

  test("q66 plan: one exchange (single key shuffle), no join") {
    val plan = Scd.userStateHistory(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert("Exchange".r.findAllIn(plan).size == 1)
  }
}
