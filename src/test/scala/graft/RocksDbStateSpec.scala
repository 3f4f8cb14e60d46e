package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4 names RocksDB as the production state backend for the
  * streaming twins (bounded-state claims should not depend on the
  * default HDFS-backed in-memory store); r9 verdict #4 asked for a
  * spec actually EXERCISING it. Re-runs the 18n cusum parity twin with
  * `spark.sql.streaming.stateStore.providerClass` flipped to
  * RocksDBStateStoreProvider — the provider is captured per query at
  * start, so the session conf is set before `.start()` and restored
  * after (sibling suites keep the default). Same batch-parity
  * assertion as StreamingSpec's: the backend must be semantically
  * invisible. */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("18n cusumStream parity holds on the RocksDB state backend") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.DriftStream
    import graft.streaming.DriftStream.CusumEvent
    val dir001 = "/root/testdata/sf0.001"
    val (t, k, h) = (5000L, 1500L, 20000L)
    val batch = operators.Changepoint.cusum(
      Tables.events(spark, dir001), "event_type", "ts", "event_id",
      "value", t, k, h)
      .filter(col("alarm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("tie"))) ->
        (r.getLong(r.fieldIndex("s_up")), r.getLong(r.fieldIndex("s_dn")),
          r.getString(r.fieldIndex("dir"))))
      .toMap
    val feed = Tables.events(spark, dir001)
      .select(col("ts"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => CusumEvent(r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.ts.getTime, e.seq))
    val prior = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[CusumEvent]
      val q = DriftStream.cusumStream(input.toDS(), t, k, h).writeStream
        .format("memory").queryName("cusum_alarms_rocksdb")
        .outputMode("append").start()
      try {
        // RocksDB must actually be the engaged provider, not a silent
        // fallback — the running query's conf echoes what was captured
        assert(q.sparkSession.conf.get(ProviderKey) == RocksDb)
        feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
          input.addData(b.toSeq); q.processAllAvailable()
        }
        val got = spark.table("cusum_alarms_rocksdb").collect()
          .map(r => (r.getString(0), r.getLong(r.fieldIndex("seq"))) ->
            (math.round(r.getDouble(r.fieldIndex("s_up")) * 100),
              math.round(r.getDouble(r.fieldIndex("s_dn")) * 100),
              r.getString(r.fieldIndex("dir"))))
          .toMap
        assert(got.size == batch.size,
          s"alarm count ${got.size} != batch ${batch.size}")
        assert(got == batch,
          "RocksDB-backed alarms must equal the batch alarm rows")
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("18o twapStream parity holds on the RocksDB state backend") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.TwapStream
    import graft.streaming.TwapStream.TwapEvent
    val dir001 = "/root/testdata/sf0.001"
    val batch = operators.Twap.userTwap(spark, dir001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    val feed = Tables.events(spark, dir001)
      .filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "value")
      .collect()
      .map(r => TwapEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.us, e.tie))
    val prior = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[TwapEvent]
      val q = TwapStream.twapStream(input.toDS()).writeStream
        .format("memory").queryName("twap_rows_rocksdb")
        .outputMode("update").start()
      try {
        assert(q.sparkSession.conf.get(ProviderKey) == RocksDb)
        feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
          input.addData(b.toSeq); q.processAllAvailable()
        }
        val got = spark.table("twap_rows_rocksdb").collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
          .groupBy(_._1).map { case (u, rs) =>
            u -> rs.map(_._2).maxBy(_._1)
          }
        assert(got.keySet == batch.keySet)
        got.foreach { case (u, row) =>
          assert(row == batch(u), s"user $u: rocksdb $row vs batch ${batch(u)}")
        }
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("18t cusumStreamLate scrambled parity holds on the RocksDB backend") {
    // the late twin adds two state shapes the base twins never store:
    // a buffered event list (Timestamps inside RocksDB state rows) and
    // event-time timeouts — both must be backend-invisible too
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    import graft.streaming.{DriftStream, LateStream}
    import graft.streaming.DriftStream.CusumEvent
    val dir001 = "/root/testdata/sf0.001"
    val (t, k, h) = (5000L, 1500L, 20000L)
    val batch = operators.Changepoint.cusum(
      Tables.events(spark, dir001), "event_type", "ts", "event_id",
      "value", t, k, h)
      .filter(col("alarm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("tie"))) ->
        (r.getLong(r.fieldIndex("s_up")), r.getLong(r.fieldIndex("s_dn")),
          r.getString(r.fieldIndex("dir"))))
      .toMap
    val feed = Tables.events(spark, dir001)
      .select(col("ts"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => CusumEvent(r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.ts.getTime, e.seq))
    // bounded scramble (the LateStreamSpec recipe): 4 chunks, shuffle
    // within each, carry a suffix across each boundary
    val chunks = feed.grouped(math.max(1, (feed.length + 3) / 4)).toSeq
    val delayMs = chunks.map(c => c.last.ts.getTime - c.head.ts.getTime).max + 1000L
    val rnd = new scala.util.Random(23)
    val batches = scala.collection.mutable.ArrayBuffer.fill(
      chunks.length)(List.empty[CusumEvent])
    chunks.zipWithIndex.foreach { case (c, i) =>
      val (stay, moved) = c.splitAt(math.max(1, c.length - 8))
      batches(i) = batches(i) ++ stay
      val dest = math.min(i + 1, chunks.length - 1)
      batches(dest) = batches(dest) ++ moved
    }
    val prior = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[CusumEvent]
      val q = LateStream.cusumStreamLate(input.toDS(), t, k, h,
          s"$delayMs milliseconds").writeStream
        .format("memory").queryName("cusum_late_rocksdb")
        .outputMode("append").start()
      try {
        assert(q.sparkSession.conf.get(ProviderKey) == RocksDb)
        batches.foreach { b =>
          input.addData(rnd.shuffle(b).toSeq); q.processAllAvailable()
        }
        val flushTs = feed.map(_.ts.getTime).max + 4 * delayMs
        for (i <- 0 to 1) {
          input.addData(Seq(CusumEvent(
            new Timestamp(flushTs + i * delayMs), "__flush", i.toLong, 0.0)))
          q.processAllAvailable()
        }
        val got = spark.table("cusum_late_rocksdb").collect()
          .filter(_.getString(0) != "__flush")
          .map(r => (r.getString(0), r.getLong(r.fieldIndex("seq"))) ->
            (math.round(r.getDouble(r.fieldIndex("s_up")) * 100),
              math.round(r.getDouble(r.fieldIndex("s_dn")) * 100),
              r.getString(r.fieldIndex("dir"))))
          .toMap
        assert(got.size == batch.size,
          s"alarm count ${got.size} != batch ${batch.size}")
        assert(got == batch,
          "RocksDB-backed late-twin alarms must equal the batch rows")
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
