package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.RangeJoin

/** Range-join semantics: bucketed plan is identical to the naive theta
  * join (including bucket-boundary straddles), bounds are inclusive. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("bucketed range join equals naive theta join on real events (both bucket sizes)") {
    val ev = Tables.events(spark, dir).cache()
    val iv = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
    val m = ev.filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("ts"), col("value"))
    val naive = RangeJoin.naiveJoin(m, iv, Seq("user_id"), "ts", "start_ts", "end_ts")
      .select("user_id", "ts", "value", "start_ts", "end_ts")
    // a bucket smaller AND larger than the interval must both be exact
    for (bucket <- Seq(600L, 7200L)) {
      val grid = RangeJoin.rangeJoin(m, iv, Seq("user_id"), "ts", "start_ts", "end_ts", bucket)
        .select("user_id", "ts", "value", "start_ts", "end_ts")
      assert(grid.exceptAll(naive).count() == 0, s"bucket $bucket extra rows")
      assert(naive.exceptAll(grid).count() == 0, s"bucket $bucket missing rows")
    }
    assert(naive.count() > 0)
  }

  test("bounds are inclusive on both ends; straddling points match once") {
    import spark.implicits._
    val iv = Seq((1L, t(1000), t(1600))).toDF("user_id", "start_ts", "end_ts")
    val pts = Seq(
      (1L, t(999)), (1L, t(1000)), (1L, t(1300)), (1L, t(1600)), (1L, t(1601)),
      (2L, t(1300)), // wrong key
    ).toDF("user_id", "ts")
    // bucket 512 puts start and end in different cells: the interval
    // explodes to several, each point still matches exactly once
    val got = RangeJoin.rangeJoin(pts, iv, Seq("user_id"), "ts", "start_ts", "end_ts", 512L)
      .select("ts").collect().map(_.getTimestamp(0)).sortBy(_.getTime)
    assert(got.toSeq == Seq(t(1000), t(1300), t(1600)))
  }
}
