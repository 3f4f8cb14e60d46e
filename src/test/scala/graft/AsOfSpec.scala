package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.AsOf

/** As-of join semantics: hand-checked tiny case (inclusive ties,
  * pre-state nulls, null-payload carry), and full parity against an
  * independent aggregate formulation on real events. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin: inclusive at equal ts, null before first state, latest state wins") {
    import spark.implicits._
    val left = Seq(
      (1L, t(5), "e1"), // before any state -> null
      (1L, t(10), "e2"), // exactly at state ts -> that state (inclusive)
      (1L, t(25), "e3"), // between states -> state@10
      (1L, t(40), "e4"), // after both -> state@30
      (2L, t(50), "e5"), // other key, no states at all -> null
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t(10), 1.0),
      (1L, t(30), 2.0),
    ).toDF("user_id", "state_ts", "sv")
    val out = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "state_ts")
      .orderBy("tag").collect()
    val got = out.map(r => (r.getString(2),
      Option(r.get(3)).map(_.toString).orNull,
      if (r.isNullAt(4)) null else r.getDouble(4).toString))
    assert(got.toSeq == Seq(
      ("e1", null, null),
      ("e2", t(10).toString, "1.0"),
      ("e3", t(10).toString, "1.0"),
      ("e4", t(30).toString, "2.0"),
      ("e5", null, null)))
  }

  test("asofJoin: a NULL right payload column still overrides older state") {
    import spark.implicits._
    val left = Seq((1L, t(20), "e1")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t(5), Some(7.0)),
      (1L, t(10), Option.empty[Double]), // newer state with null value
    ).toDF("user_id", "state_ts", "sv")
    val r = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "state_ts").head()
    // state_ts must be 10 (the newer state), sv must be null — NOT 7.0
    // (ignoreNulls must skip missing rows, not null-valued ones)
    assert(r.getTimestamp(3) == t(10))
    assert(r.isNullAt(4))
  }

  test("asofJoin: NULL keys never match (SQL equality), null-key left rows survive unenriched") {
    import spark.implicits._
    // Window.partitionBy groups NULL keys together — without the
    // null-key right filter, e1 would pick up the null-key state@5,
    // which the SQL twin's l.user_id = r.user_id can never produce.
    val left = Seq(
      (Option.empty[Long], t(10), "e1"), // null key -> no state, row kept
      (Some(1L), t(10), "e2"), // real key -> state@5
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (Option.empty[Long], t(5), 9.0), // null-key state: attaches to nothing
      (Some(1L), t(5), 1.0),
    ).toDF("user_id", "state_ts", "sv")
    val out = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "state_ts")
      .orderBy("tag").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(3) && out(0).isNullAt(4), s"null-key row enriched: ${out(0)}")
    assert(out(1).getTimestamp(3) == t(5) && out(1).getDouble(4) == 1.0)
  }

  test("q35 matches an independent max-rts aggregate formulation on real events") {
    val ev = Tables.events(spark, dir).cache()
    // exceptAll is positional: align column order with the naive frame
    val out = AsOf.asofEventState(spark, dir)
      .select("event_id", "user_id", "ts", "event_type", "value", "state_ts", "state_value")
    val left = ev.filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        (round(col("value"), 4) + 0.0).as("value"))
    val right = ev.filter(col("event_type").isin("signup", "error"))
      .groupBy(col("user_id").as("r_uid"), col("ts").as("state_ts"))
      .agg((round(max_by(col("value"), col("event_id")), 4) + 0.0).as("state_value"))
    // naive: all (left, right) pairs with rts <= ts, keep the max rts
    val naive = left
      .join(right, col("user_id") === col("r_uid") && col("state_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(
        first(col("user_id")).as("user_id"), first(col("ts")).as("ts"),
        first(col("event_type")).as("event_type"), first(col("value")).as("value"),
        max_by(col("state_ts"), col("state_ts")).as("state_ts"),
        max_by(col("state_value"), col("state_ts")).as("state_value"))
      .select("event_id", "user_id", "ts", "event_type", "value", "state_ts", "state_value")
    assert(out.count() == left.count())
    assert(out.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(out).count() == 0)
  }
}
