package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  // offset from epoch 0: the initial event-time watermark is 0, and a
  // stateful operator drops rows at-or-before the watermark
  def ts(minutes: Long): Timestamp = new Timestamp((24 * 60 + minutes) * 60000L)

  test("ksDriftStream: closed-window alert equals the batch q99 ksTest exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.DriftStream
    // baseline: uniform-ish cells over 1..4
    val baseline = Map(1.0 -> 5L, 2.0 -> 5L, 3.0 -> 5L, 4.0 -> 5L)
    // window 0 (minutes 0-59 after the ts() day offset): skewed sample
    val w0 = Seq(1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 1.0, 3.0)
    val input = MemoryStream[(Timestamp, Double)]
    val q = DriftStream.ksDriftStream(
      input.toDF().toDF("ts", "v"), baseline, windowMs = 3600000L,
      watermark = "5 minutes").writeStream
      .format("memory").queryName("drift").outputMode("append").start()
    try {
      input.addData(w0.zipWithIndex.map { case (v, i) => (ts(i.toLong), v) })
      q.processAllAvailable()
      // advance the watermark far past window 0's end
      input.addData(Seq((ts(200), 2.0)))
      q.processAllAvailable()
      input.addData(Seq((ts(400), 2.0)))
      q.processAllAvailable()
      val alerts = spark.table("drift").collect()
      assert(alerts.length >= 1, "window 0 should have closed and emitted")
      val a = alerts.minBy(_.getTimestamp(0).getTime)
      assert(a.getLong(a.fieldIndex("n_window")) == w0.size.toLong)
      // parity: batch ksTest over the same rows vs the expanded baseline
      val batchRows =
        w0.map(v => ("w", "X", v)) ++
          baseline.toSeq.flatMap { case (v, c) => Seq.fill(c.toInt)(("w", "Y", v)) }
      val b = operators.Hypothesis
        .ksTest(batchRows.toDF("g", "c", "v"), "g", "c", "X", "Y", "v").head()
      assert(a.getDouble(a.fieldIndex("d_stat")) ==
        b.getDouble(b.fieldIndex("d_stat")), "D must match batch q99")
      assert(a.getDouble(a.fieldIndex("ks_z")) ==
        b.getDouble(b.fieldIndex("ks_z")), "z must match batch q99")
    } finally q.stop()
  }

  test("cusumStream: ordered replay reproduces the batch q105 alarm set exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.DriftStream
    import graft.streaming.DriftStream.CusumEvent
    val dir001 = "/root/testdata/sf0.001"
    val (t, k, h) = (5000L, 1500L, 20000L)
    // batch truth: alarm rows keyed by (series, tie)
    val batch = operators.Changepoint.cusum(
      Tables.events(spark, dir001), "event_type", "ts", "event_id",
      "value", t, k, h)
      .filter(col("alarm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("tie"))) ->
        (r.getLong(r.fieldIndex("s_up")), r.getLong(r.fieldIndex("s_dn")),
          r.getString(r.fieldIndex("dir"))))
      .toMap
    // replay in per-key order (ts, event_id) across three micro-batches
    val feed = Tables.events(spark, dir001)
      .select(col("ts"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => CusumEvent(r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.ts.getTime, e.seq))
    val input = MemoryStream[CusumEvent]
    val q = DriftStream.cusumStream(input.toDS(), t, k, h).writeStream
      .format("memory").queryName("cusum_alarms").outputMode("append").start()
    try {
      feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      val got = spark.table("cusum_alarms").collect()
        .map(r => (r.getString(0), r.getLong(r.fieldIndex("seq"))) ->
          (math.round(r.getDouble(r.fieldIndex("s_up")) * 100),
            math.round(r.getDouble(r.fieldIndex("s_dn")) * 100),
            r.getString(r.fieldIndex("dir"))))
        .toMap
      assert(got.size == batch.size,
        s"alarm count ${got.size} != batch ${batch.size}")
      assert(got == batch, "streaming alarms must equal the batch alarm rows")
    } finally q.stop()
  }

  test("twapStream: ordered replay converges to the batch q113 rows exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.TwapStream
    import graft.streaming.TwapStream.TwapEvent
    val dir001 = "/root/testdata/sf0.001"
    // batch truth keyed by user
    val batch = operators.Twap.userTwap(spark, dir001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    // replay the same rows (batch drops NULL values; micros + event_id
    // is the same total order) across three micro-batches
    val feed = Tables.events(spark, dir001)
      .filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "value")
      .collect()
      .map(r => TwapEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.us, e.tie))
    val input = MemoryStream[TwapEvent]
    val q = TwapStream.twapStream(input.toDS()).writeStream
      .format("memory").queryName("twap_rows").outputMode("update").start()
    try {
      feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // update mode: the memory sink keeps the latest row per key per
      // batch — take each user's final emission
      val got = spark.table("twap_rows").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
        .groupBy(_._1).map { case (u, rs) =>
          u -> rs.map(_._2).maxBy(_._1) // most events = latest state
        }
      assert(got.keySet == batch.keySet)
      got.foreach { case (u, row) =>
        assert(row == batch(u), s"user $u: streaming $row vs batch ${batch(u)}")
      }
    } finally q.stop()
  }

  test("windowedCounts over a memory stream matches batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedCounts(df).writeStream
      .format("memory").queryName("wc").outputMode("update").start()
    try {
      input.addData(
        (ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(61), "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("wc")
      assert(out.filter(col("event_type") === "click")
        .select(sum("n_events")).head.getLong(0) == 2L)
      assert(out.filter(col("event_type") === "view").count() == 1)
    } finally q.stop()
  }

  test("windowed distinct users: streaming HLL tracks exact distinct within 3 rsd") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("user_id"))
    val feed = events.as[(Timestamp, String, Long)].collect().sortBy(_._1.getTime)
    val input = MemoryStream[(Timestamp, String, Long)]
    val q = EventStream.windowedDistinctUsers(
      input.toDF().toDF("ts", "event_type", "user_id")).writeStream
      .format("memory").queryName("wdu").outputMode("update").start()
    try {
      val (b1, b2) = feed.splitAt(feed.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      // update mode re-emits refined rows: keep each group's LAST emission
      val got = spark.table("wdu")
        .groupBy("hour_start", "event_type")
        .agg(last("approx_users").as("approx_users"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val exact = events
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count_distinct(col("user_id")).as("d")).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.keySet == exact.keySet)
      exact.foreach { case (k, d) =>
        val est = got(k).toDouble
        assert(math.abs(est - d) <= math.max(3.0, 3 * 0.02 * d),
          s"window $k: est $est vs exact $d")
      }
    } finally q.stop()
  }

  test("streaming sessionize splits on gap and aggregates per session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMs = 10 * 60000L)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 7: two events 5 min apart (one session), then 30 min gap →
      // new session; the arrival of the later event closes the first.
      input.addData(
        Event(ts(0), 7L, "click", 1.0),
        Event(ts(5), 7L, "click", 2.0),
        Event(ts(35), 7L, "view", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect()
      assert(sessions.length == 1)
      assert(sessions.head.n_events == 2 && sessions.head.sum_value == 3.0)
      assert(sessions.head.session_start == ts(0) && sessions.head.session_end == ts(5))
    } finally q.stop()
  }

  test("dedupStream keeps first doc per content hash within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = EventStream.dedupStream(df).writeStream
      .format("memory").queryName("dd").outputMode("append").start()
    try {
      input.addData(
        (ts(0), 1L, "alpha beta"), (ts(1), 2L, "alpha beta"), (ts(2), 3L, "gamma"))
      q.processAllAvailable()
      input.addData((ts(3), 4L, "gamma")) // duplicate in a later batch
      q.processAllAvailable()
      val out = spark.table("dd")
      assert(out.count() == 2)
      assert(out.filter(col("doc_id").isin(1L, 3L)).count() == 2)
    } finally q.stop()
  }

  test("streaming sessionize: late in-watermark event extends bounds, never corrupts them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMs = 10 * 60000L)
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      input.addData(Event(ts(20), 9L, "click", 1.0))
      q.processAllAvailable()
      // late event 5 min BEFORE the session start, still within watermark
      input.addData(Event(ts(15), 9L, "click", 2.0))
      q.processAllAvailable()
      // a far-future event closes the session
      input.addData(Event(ts(120), 9L, "view", 4.0))
      q.processAllAvailable()
      val s = spark.table("sess_late").as[Session].collect()
        .find(_.n_events == 2).get
      assert(s.session_start == ts(15) && s.session_end == ts(20),
        s"bounds ${s.session_start}..${s.session_end}")
    } finally q.stop()
  }

  test("streaming minhash near-dup: duplicate docs pair across batches, distinct don't") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = EventStream.nearDupStream(docs).writeStream
      .format("memory").queryName("ndup").outputMode("append").start()
    try {
      val dup = "alpha beta gamma delta epsilon zeta eta theta"
      input.addData((ts(0), 1L, dup), (ts(1), 2L, "totally different words here now ok yes"))
      q.processAllAvailable()
      input.addData((ts(2), 3L, dup)) // duplicate arrives in a LATER batch
      q.processAllAvailable()
      val pairs = spark.table("ndup").select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.toSet == Set((1L, 3L)), s"got ${pairs.mkString(",")}")
    } finally q.stop()
  }

  test("text-stats operators run unchanged on a stream (stateless projections)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = textstats.TextStats.quality(docs).writeStream
      .format("memory").queryName("q_stream").outputMode("append").start()
    try {
      input.addData((1L, "the cat sat on the mat", "en", "s", 22L),
        (2L, "xyzzy", "en", "s", 5L))
      q.processAllAvailable()
      val out = spark.table("q_stream")
      assert(out.count() == 2)
      // stopword-rich doc must outscore the garbage token
      val scores = out.orderBy("doc_id").select("quality_score").collect().map(_.getDouble(0))
      assert(scores(0) > scores(1))
    } finally q.stop()
  }

  test("asofStream enriches out-of-order measures once the watermark releases them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.{AsofEvent, EnrichedEvent}
    val input = MemoryStream[AsofEvent]
    val q = EventStream.asofStream(input.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      // batch 1: a state@10 and measures@5 (pre-state) and @12 — plus a
      // watermark pusher far ahead so 5/10/12 fall behind the watermark
      input.addData(
        AsofEvent(1L, ts(10), 0, 100L, 50.0),
        AsofEvent(1L, ts(5), 1, 1L, 1.0),
        AsofEvent(1L, ts(12), 1, 2L, 2.0),
        AsofEvent(99L, ts(120), 1, 9L, 9.0)) // watermark pusher
      q.processAllAvailable()
      // batch 2 advances the watermark past batch 1's events; a LATE but
      // in-watermark state must NOT rewrite already-emitted rows
      input.addData(AsofEvent(99L, ts(240), 1, 10L, 9.0))
      q.processAllAvailable()
      val out = spark.table("asof").as[EnrichedEvent].collect()
        .filter(_.user_id == 1L).sortBy(_.event_id)
      assert(out.length == 2, s"got ${out.mkString(";")}")
      // measure@5: before any state -> null enrichment
      assert(out(0).event_id == 1L && out(0).state_ts.isEmpty)
      // measure@12: enriched with state@10
      assert(out(1).event_id == 2L && out(1).state_ts.contains(ts(10))
        && out(1).state_value.contains(50.0))
    } finally q.stop()
  }

  test("asofStream: batch-1 state survives until TTL of EVENT time (not epoch+TTL)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.{AsofEvent, EnrichedEvent}
    val input = MemoryStream[AsofEvent]
    // 24h TTL: the watermark is 0 during batch 1, so a timeout anchored
    // on it would land at epoch+24h — BEHIND these event times — and
    // evict the user's state as soon as the watermark moves
    val q = EventStream.asofStream(input.toDS(), watermark = "5 minutes",
      stateTtlMs = 24 * 3600 * 1000L)
      .writeStream.format("memory").queryName("asof_ttl").outputMode("append").start()
    try {
      input.addData(AsofEvent(1L, ts(10), 0, 100L, 50.0)) // state only, batch 1
      q.processAllAvailable()
      input.addData(AsofEvent(99L, ts(240), 1, 9L, 9.0)) // watermark pusher
      q.processAllAvailable()
      input.addData(
        AsofEvent(1L, ts(300), 1, 1L, 1.0), // measure AFTER the idle gap
        AsofEvent(99L, ts(600), 1, 10L, 9.0)) // releases it
      q.processAllAvailable()
      val u1 = spark.table("asof_ttl").as[EnrichedEvent].collect()
        .filter(_.user_id == 1L)
      assert(u1.length == 1)
      assert(u1.head.state_ts.contains(ts(10)), s"state lost: ${u1.head}")
    } finally q.stop()
  }

  test("asofStream: watermark-boundary semantics — ts <= watermark is LATE, release loses nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.{AsofEvent, EnrichedEvent}
    val input = MemoryStream[AsofEvent]
    val q = EventStream.asofStream(input.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_eq").outputMode("append").start()
    try {
      // batch 1: measure@10; pusher@15 lands the watermark EXACTLY at 10.
      input.addData(
        AsofEvent(1L, ts(10), 1, 1L, 1.0),
        AsofEvent(99L, ts(15), 1, 9L, 9.0))
      q.processAllAvailable()
      // batch 2: a state with event time EQUAL to the watermark. Spark's
      // late-data drop predicate is ts <= watermark (LessThanOrEqual in
      // WatermarkSupport, verified against 4.1.2), so this row is LATE —
      // it must be dropped, never half-applied: the measure emits exactly
      // once, unenriched, matching the at-or-before release in asofStream.
      input.addData(
        AsofEvent(1L, ts(10), 0, 100L, 50.0),
        AsofEvent(99L, ts(60), 1, 10L, 9.0))
      q.processAllAvailable()
      val u1 = spark.table("asof_eq").as[EnrichedEvent].collect().filter(_.user_id == 1L)
      assert(u1.length == 1, s"boundary measure must emit exactly once: ${u1.mkString(";")}")
      assert(u1.head.state_ts.isEmpty,
        s"a late (ts == watermark) state must not attach: ${u1.head}")
    } finally q.stop()
  }

  test("rangeJoinStream: NULL interval bounds produce no matches, not a query abort") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mIn = MemoryStream[(Long, Timestamp, Double)]
    val iIn = MemoryStream[(Long, Timestamp, Option[Timestamp])]
    val measures = mIn.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val intervals = iIn.toDF().toDF("user_id", "start_ts", "end_ts")
      .withWatermark("start_ts", "10 minutes")
    val q = EventStream.rangeJoinStream(measures, intervals,
      Seq("user_id"), "ts", "start_ts", "end_ts", "30 minutes")
      .writeStream.format("memory").queryName("rjs_null").outputMode("append").start()
    try {
      // null end_ts: the guard's assert_true must not throw on the null
      // comparison; the join condition then yields no match for the row
      mIn.addData((1L, ts(12), 1.0), (2L, ts(12), 2.0))
      iIn.addData((1L, ts(10), None), (2L, ts(10), Some(ts(20))))
      q.processAllAvailable()
      val got = spark.table("rjs_null").select("user_id").collect().map(_.getLong(0))
      assert(got.toSeq == Seq(2L), s"got ${got.mkString(",")}")
    } finally q.stop()
  }

  test("asofStream matches the batch asofJoin on a replayed event set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.{AsofEvent, EnrichedEvent}
    // deterministic scrambled replay: states and measures interleaved
    // out of order within the watermark
    val evs = (0 until 60).map { i =>
      val side = if (i % 3 == 0) 0 else 1
      AsofEvent(i % 4, ts(i * 7 % 50), side, 1000L + i, i.toDouble)
    }
    // batch twin expects unique (user, ts) state rows — drop dup states
    val stateKey = scala.collection.mutable.Set.empty[(Long, Long)]
    val uniq = evs.filter(e =>
      e.side == 1 || stateKey.add((e.user_id, e.ts.getTime)))
    val input = MemoryStream[AsofEvent]
    // watermark must cover the 50-minute scramble: the replay arrives
    // wildly out of order ACROSS batches, and anything behind the
    // watermark is (correctly) dropped as too-late data
    val q = EventStream.asofStream(input.toDS(), watermark = "2 hours")
      .writeStream.format("memory").queryName("asof_par").outputMode("append").start()
    try {
      uniq.grouped(13).foreach { g => input.addData(g); q.processAllAvailable() }
      // watermark pusher so every real event falls behind it
      input.addData(AsofEvent(999L, ts(10000), 1, 1L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("asof_par").as[EnrichedEvent].collect()
        .filter(_.user_id != 999L)
        .map(e => (e.event_id, e.state_ts.map(_.getTime).getOrElse(-1L),
          e.state_value.getOrElse(-1.0))).sortBy(_._1)
      val left = uniq.filter(_.side == 1)
        .map(e => (e.user_id, e.ts, e.event_id, e.value))
        .toDF("user_id", "ts", "event_id", "value")
      val right = uniq.filter(_.side == 0)
        .map(e => (e.user_id, e.ts, e.value))
        .toDF("user_id", "state_ts", "state_value")
      val batch = operators.AsOf.asofJoin(left, right, Seq("user_id"), "ts", "state_ts")
        .collect().map(r => (r.getLong(2),
          if (r.isNullAt(4)) -1L else r.getTimestamp(4).getTime,
          if (r.isNullAt(5)) -1.0 else r.getDouble(5))).sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("rangeJoinStream: stream-stream interval join matches the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mIn = MemoryStream[(Long, Timestamp, Double)]
    val iIn = MemoryStream[(Long, Timestamp, Timestamp)]
    val measures = mIn.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val intervals = iIn.toDF().toDF("user_id", "start_ts", "end_ts")
      .withWatermark("start_ts", "10 minutes")
    val q = EventStream.rangeJoinStream(measures, intervals,
      Seq("user_id"), "ts", "start_ts", "end_ts", "30 minutes")
      .writeStream.format("memory").queryName("rjs").outputMode("append").start()
    try {
      // interval arrives AFTER some of its points (stream-stream join
      // buffers both sides); a short interval (10 < 30 max) exercises
      // the exact endTs trim vs the coarse literal bound
      mIn.addData((1L, ts(5), 1.0), (1L, ts(12), 2.0), (1L, ts(25), 3.0), (2L, ts(12), 9.0))
      iIn.addData((1L, ts(10), ts(20)))
      q.processAllAvailable()
      mIn.addData((1L, ts(18), 4.0)) // late-side point for the buffered interval
      q.processAllAvailable()
      val got = spark.table("rjs").select("ts", "value").collect()
        .map(r => (r.getTimestamp(0), r.getDouble(1))).sortBy(_._1.getTime)
      // in [10,20] for user 1: ts(12) and ts(18); NOT ts(5) (before),
      // NOT ts(25) (the exact endTs trim — it IS inside the 30-min
      // coarse bound), NOT user 2
      assert(got.toSeq == Seq((ts(12), 2.0), (ts(18), 4.0)), s"got ${got.mkString(",")}")
      // batch twin on identical data agrees
      val bm = Seq((1L, ts(5), 1.0), (1L, ts(12), 2.0), (1L, ts(25), 3.0),
        (2L, ts(12), 9.0), (1L, ts(18), 4.0)).toDF("user_id", "ts", "value")
      val bi = Seq((1L, ts(10), ts(20))).toDF("user_id", "start_ts", "end_ts")
      val batch = operators.RangeJoin.rangeJoin(bm, bi, Seq("user_id"), "ts", "start_ts", "end_ts", 600L)
        .select("ts", "value").collect()
        .map(r => (r.getTimestamp(0), r.getDouble(1))).sortBy(_._1.getTime)
      assert(batch.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("rangeJoinStream: an interval longer than maxInterval fails loudly, never silently loses matches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mIn = MemoryStream[(Long, Timestamp, Double)]
    val iIn = MemoryStream[(Long, Timestamp, Timestamp)]
    val measures = mIn.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val intervals = iIn.toDF().toDF("user_id", "start_ts", "end_ts")
      .withWatermark("start_ts", "10 minutes")
    val q = EventStream.rangeJoinStream(measures, intervals,
      Seq("user_id"), "ts", "start_ts", "end_ts", "30 minutes")
      .writeStream.format("memory").queryName("rjs_guard").outputMode("append").start()
    try {
      mIn.addData((1L, ts(45), 1.0)) // would be a silently-lost tail match
      iIn.addData((1L, ts(10), ts(70))) // 60-min interval > 30-min contract
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("maxInterval")
        || Option(e.getCause).exists(_.getMessage != null)
        , s"unexpected failure: ${e.getMessage}")
    } finally q.stop()
  }

  test("batch sessionize on testdata: session bounds ordered, events conserved") {
    val df = operators.Events.sessionize(spark, "/root/testdata/sf0.001").cache()
    assert(df.filter(col("session_start") > col("session_end")).count() == 0)
    assert(df.select(sum("n_events")).head.getLong(0) ==
      Tables.events(spark, "/root/testdata/sf0.001").count())
  }

  test("streaming heavy hitters: planted hot term survives with honest bounds, state stays capped") {
    import graft.streaming.HeavyHittersStream
    import graft.streaming.HeavyHittersStream.{MgCounter, TokRow}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val cap = 8
    val q = HeavyHittersStream.heavyHitters(
        HeavyHittersStream.tokenStream(docs), capacity = cap)
      .writeStream.format("memory").queryName("hh").outputMode("update").start()
    try {
      // "hot" appears 120x; 300 distinct rare terms churn the tables
      val batch1 = (0 until 60).map(i => (i.toLong, s"hot rare${i}a rare${i}b"))
      val batch2 = (60 until 120).map(i => (i.toLong, s"hot rare${i}a rare${i}b rare${i}c"))
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val out = spark.table("hh").as[MgCounter].collect()
      val hot = out.filter(_.term == "hot")
      assert(hot.nonEmpty, "hot term must survive in its home group")
      assert(hot.map(_.part).distinct.length == 1, "hot lives in exactly one group")
      // every snapshot's lower bound is ≤ the true final count, and the
      // final snapshot's upper bound covers it (order-insensitive form:
      // max over snapshots)
      assert(hot.map(_.lower).max <= 120L)
      assert(hot.map(_.upper).max >= 120L,
        s"true count 120 above every upper bound ${hot.map(_.upper).max}")
      // frequency guarantee: hot's group saw <= 420 tokens, 120 > N/(cap+1)
      // state cap: no group ever emits more than `cap` live counters
      val perGroup = out.groupBy(_.part).values
      assert(perGroup.forall(_.groupBy(_.term).size <= 3 * cap),
        "emitted vocabulary per group should stay near the cap")
      val tok = HeavyHittersStream.tokenStream(
        Seq((1L, "a b c")).toDF("doc_id", "text"))
      assert(tok.isStreaming == false && tok.count() == 3) // front end is batch-agnostic
    } finally q.stop()
  }

  test("streaming contamination: stream-static probe matches the batch operator's math") {
    import graft.dedup.{Contamination, Dedup}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val benchDocs = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val bench = Dedup.docShingles(benchDocs).select("shk").distinct()
    val input = MemoryStream[(Timestamp, Long, String)]
    val stream = input.toDF().toDF("ts", "doc_id", "text")
    val q = Contamination.contaminationStream(stream, bench)
      .writeStream.format("memory").queryName("cstream").outputMode("update").start()
    try {
      input.addData(
        (ts(1), 1L, "the quick brown fox jumps over the lazy dog"), // exact copy
        (ts(2), 2L, "completely different words nothing shared here at all"),
        (ts(3), 3L, "the quick brown fox and then something else entirely"))
      q.processAllAvailable()
      val got = spark.table("cstream")
        .select("doc_id", "contam_frac", "contaminated")
        .as[(Long, Double, Int)].collect().groupBy(_._1).map(_._2.last).toSeq
      assert(got.size == 3)
      val byId = got.map(r => r._1 -> r).toMap
      assert(byId(1L) == ((1L, 1.0, 1)))
      assert(byId(2L) == ((2L, 0.0, 0)))
      assert(byId(3L)._2 > 0.0 && byId(3L)._2 < 1.0)
    } finally q.stop()
  }

  test("sketch distinct: HLL estimate within 3*rsd of exact per event_type") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val est = operators.Sketches.approxDistinct(ev, Seq("event_type"), "user_id")
    val exact = operators.Sketches.exactDistinct(ev, Seq("event_type"), "user_id")
    val joined = est.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, x) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(e - x) <= math.max(3 * 0.05 * x, 2.0),
        s"${r.getString(0)}: est $e vs exact $x")
    }
  }

  test("sketch count-min: est >= exact always, overcount within eps*N") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
    val cms = operators.Sketches.countMin(toks, "tok", eps = 0.001)
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    val n = exact.map(_._2).sum
    exact.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"'$t': CMS undercounted ($est < $c)")
      // 0.99 confidence per query; whole-vocab slack of 3x eps*N keeps
      // the spec deterministic-in-practice without weakening the bound
      assert(est <= c + (3 * 0.001 * n).toLong + 1, s"'$t': est $est vs $c (n=$n)")
    }
    // never-seen keys may only carry collision mass, bounded the same way
    assert(cms.estimateCount("graft-definitely-absent-token") <= (3 * 0.001 * n).toLong)
  }

  test("cmsEstimate column agrees with driver-side probes and bounds exact counts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
    val cms = operators.Sketches.countMin(toks, "tok", eps = 0.001)
    val exact = toks.groupBy("tok").count()
    val n = toks.count()
    // distributed estimate column vs exact counts, per distinct token
    val checked = operators.Sketches.cmsEstimate(exact, cms, "tok").collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val (t, c, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= c, s"'$t': distributed CMS undercounted ($est < $c)")
      assert(est <= c + (3 * 0.001 * n).toLong + 1, s"'$t': est $est vs $c")
      // bitwise agreement with the driver-side probe of the same sketch
      assert(est == cms.estimateCount(t), s"'$t': column/driver probe disagree")
    }
  }

  test("streaming rollup: IncrementalAgg.partial over a stream equals the batch state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the SAME partial() code runs as a continuously-maintained
    // streaming aggregate — mergeable sufficient stats are exactly
    // what Structured Streaming's state store needs
    val rows = Seq(("a", 1.5), ("b", 2.0), ("a", -3.25), ("c", 7.0),
      ("b", 2.0), ("a", 10.0))
    val input = MemoryStream[(String, Double)]
    val q = operators.IncrementalAgg.partial(
        input.toDF().toDF("k", "x"), "k", "x")
      .writeStream.format("memory").queryName("rollup")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(3)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = spark.table("rollup").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
      val want = operators.IncrementalAgg.partial(
          rows.toDF("k", "x"), "k", "x").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming model state: Regression.wlsPartial over a stream equals the batch state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the s15 model-maintenance state is mergeable sufficient
    // statistics, so the SAME wlsPartial() code runs as a continuously
    // maintained streaming aggregate; solving the streamed state must
    // give bitwise the coefficients of the batch fit
    val rows = (0 until 60).map { i =>
      (i % 2, (1 + i % 4).toDouble, (i % 9).toDouble / 4.0,
        (i % 5).toDouble, 0.5 + 1.25 * (i % 9) / 4.0 - 0.75 * (i % 5))
    }
    val input = MemoryStream[(Int, Double, Double, Double, Double)]
    val q = operators.Regression.wlsPartial(
        input.toDF().toDF("g", "w", "x1", "x2", "y"), Seq("g"))
      .writeStream.format("memory").queryName("wls_state")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(25)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = operators.Regression.wlsSolveState(
          spark.table("wls_state"), Seq("g"))
        .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
      val want = operators.Regression.wlsFitBy(
          rows.toDF("g", "w", "x1", "x2", "y"), Seq("g"))
        .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("streaming SCD-2: ordered replay reproduces the batch operator's closed versions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 20) // a few keys, many observations
    // batch truth: the CLOSED versions (the open one lives in stream state)
    val batch = operators.Scd.userStateHistory(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 20 && col("valid_to").isNotNull)
      .select("user_id", "state", "valid_from", "valid_to", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getInt(4))).toSet
    val feed = events
      .select(col("user_id").cast("long").as("key"),
        col("event_type").as("state"), col("ts"),
        col("event_id").cast("long").as("tie"))
      .as[EventStream.ScdObs].collect()
      .sortBy(o => (o.ts.getTime, o.tie))
    val input = MemoryStream[EventStream.ScdObs]
    val q = EventStream.scd2Stream(input.toDS()).writeStream
      .format("memory").queryName("scd").outputMode("append").start()
    try {
      // ordered replay across three micro-batches: open versions must
      // carry across batch boundaries in state
      val (b1, rest) = feed.splitAt(feed.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      input.addData(b3.toSeq); q.processAllAvailable()
      val got = spark.table("scd").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getInt(4))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming attribution: ordered replay reproduces the batch rollup exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // batch truth: the registered q80 rollup
    val batch = operators.Attribution.lastTouch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val feed = Tables.events(spark, dir)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"), col("value"))
      .as[EventStream.AttrEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[EventStream.AttrEvent]
    val q = EventStream.attributionStream(input.toDS()).writeStream
      .format("memory").queryName("attr").outputMode("append").start()
    try {
      // ordered replay across three micro-batches: the carried touch
      // must survive batch boundaries in state
      val (b1, rest) = feed.splitAt(feed.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      input.addData(b3.toSeq); q.processAllAvailable()
      // roll per-conversion rows up exactly the way the batch query does
      val got = spark.table("attr")
        .groupBy("touch_type")
        .agg(count(lit(1)).as("n_conversions"),
          (expr("sum(CAST(floor(value * 10000) AS BIGINT))") / 10000.0).as("revenue"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming packer: ordered replay reproduces the batch packer exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = operators.Chunking.pack(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(6), r.getLong(7)))
    val feed = docs
      .select(col("doc_id").cast("long"),
        pmod(col("doc_id"), lit(operators.Chunking.PackShards)).cast("long").as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[EventStream.PackDoc].collect().sortBy(_.doc_id)
    val input = MemoryStream[EventStream.PackDoc]
    val q = EventStream.packStream(input.toDS()).writeStream
      .format("memory").queryName("packed").outputMode("append").start()
    try {
      // split the ordered replay across three micro-batches: state must
      // carry each shard's offset across batch boundaries
      val (b1, rest) = feed.splitAt(feed.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      input.addData(b3.toSeq); q.processAllAvailable()
      val got = spark.table("packed").orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(6), r.getLong(7)))
      assert(got.length == batch.length)
      got.zip(batch).foreach { case (g, b) =>
        assert(g == b, s"stream $g vs batch $b")
      }
    } finally q.stop()
  }

  test("q314: the registered sessionize replay equals batch q18 (micros preserved)") {
    val dir = "/root/testdata/sf0.001"
    val got = EventStream.replaySessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = operators.Events.sessionize(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(2)} extra=${(got -- want).take(2)}")
    // the r16 registration bug class: parquet micros must survive the
    // session-state round trip (epoch-millis state truncated them)
    assert(got.exists(s => s._2.getNanos % 1000000 != 0),
      "no sub-millisecond session bound survived — micros truncated?")
  }

  test("q315: every guaranteed-heavy term survives the MG stream with honest bounds") {
    import graft.streaming.HeavyHittersStream
    val dir = "/root/testdata/sf0.001"
    val out = HeavyHittersStream.replayGuaranteed(spark, dir).cache()
    // the registered row IS the guarantee: by the driver gate it must
    // equal the exact set; here pin non-degeneracy and key uniqueness
    assert(out.count() > 0, "no guaranteed-heavy terms at sf0.001")
    assert(out.groupBy("part", "term").count().filter(col("count") > 1).count() == 0)
  }

  test("streaming sessionization: watermark-closed sessions equal the batch q18 sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // batch truth: the registered q18 sessions (session_seq is an
    // ordinal the streaming side has no business reproducing — key on
    // the observable session identity instead)
    val batch = operators.Events.sessionize(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))
        -> r.getDouble(4)).toMap
    // the data has no exact-30-minute inter-event gap (checked against
    // the generator output), so the half-open session_window boundary
    // and the batch operator's `> gap` split agree on every session
    val feed = Tables.events(spark, dir)
      .select(col("ts"), col("user_id").cast("long"), col("value"))
      .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime)
    val input = MemoryStream[(Timestamp, Long, Double)]
    val q = EventStream.sessionizeStream(
      input.toDF().toDF("ts", "user_id", "value"),
      watermark = "45 days").writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    try {
      // out-of-order replay across three micro-batches: the OLDEST
      // third arrives AFTER the middle third — the 45-day watermark
      // exceeds the table's whole 30-day span, so nothing is late and
      // every late merge must land in the right session
      val third = feed.length / 3
      val (b1, rest) = feed.splitAt(third)
      val (b2, b3) = rest.splitAt(third)
      input.addData(b2.toSeq); q.processAllAvailable()
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b3.toSeq); q.processAllAvailable()
      // sentinel far past every session end advances the watermark and
      // flushes all real sessions (watermark set by batch N applies in
      // batch N+1 — hence two sentinel batches)
      val flushTs = feed.map(_._1.getTime).max + 90L * 86400000L
      input.addData((new Timestamp(flushTs), -1L, 0.0)); q.processAllAvailable()
      input.addData((new Timestamp(flushTs + 60000L), -1L, 0.0)); q.processAllAvailable()
      val got = spark.table("sess").filter(col("user_id") >= 0L).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))
          -> r.getDouble(4)).toMap
      assert(got.keySet == batch.keySet)
      // sums accumulate in arrival order vs the batch plan's scan order:
      // identical sessions, last-ulp summation tolerance on the value
      got.foreach { case (k, v) => assert(math.abs(v - batch(k)) < 1e-6) }
    } finally q.stop()
  }
}
