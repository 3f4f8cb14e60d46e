package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.DdSketch
import streaming.DdSketchStream
import streaming.DdSketchStream.ValueEvent

/** The streaming DDSketch twin: multi-batch replay's FINAL emission
  * per (g, p) equals the batch quantile readout exactly; state stays
  * bounded by the log range; buckets/estimates match the batch
  * expressions value for value. */
class DdSketchStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  private val dir = "/root/testdata/sf0.001"

  test("JVM bucket/estimate primitives ≡ the batch Catalyst expressions") {
    import spark.implicits._
    val xs = Seq(1.0, 1.5, 2.0, 97.37, 1024.0, 451234.875)
    val batch = xs.toDF("x")
      .select(DdSketch.bucketOf(col("x")).as("i"))
      .withColumn("e", DdSketch.estimateOf(col("i")))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val jvm = xs.map { x =>
      val i = DdSketchStream.bucketOf(x); (i, DdSketchStream.estimateOf(i))
    }
    assert(batch.toSeq == jvm, s"batch $batch vs jvm $jvm")
  }

  test("three-batch replay ≡ batch quantiles, per (g, p), exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x"),
        col("o_orderkey").as("k"))
    val ns = rows.groupBy("g").agg(count(lit(1)).as("n"))
    val want = DdSketch.quantiles(DdSketch.sketch(rows), ns, DdSketch.Ps)
      .collect()
      .map(r => (r.getString(r.fieldIndex("g")), r.getDouble(r.fieldIndex("p")))
        -> (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("i")),
          r.getDouble(r.fieldIndex("est"))))
      .toMap
    assert(want.size == 15)

    val feed = rows.select("g", "x").collect()
      .map(r => ValueEvent(r.getString(0), r.getDouble(1)))
    val in = MemoryStream[ValueEvent]
    val q = DdSketchStream.ddSketchStream(in.toDS())
      .writeStream.format("memory").queryName("dds_stream")
      .outputMode("update").start()
    val got =
      try {
        feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
          in.addData(b.toSeq); q.processAllAvailable()
        }
        // Update mode: last emission per (g, p) is the final state
        spark.table("dds_stream").collect().zipWithIndex
          .groupBy { case (r, _) => (r.getString(0), r.getDouble(1)) }
          .map { case (k, vs) =>
            val r = vs.maxBy(_._2)._1
            k -> (r.getLong(2), r.getLong(3), r.getDouble(4))
          }
      } finally q.stop()
    assert(got == want,
      s"diff=${(want.toSet -- got.toSet).take(2)} | ${(got.toSet -- want.toSet).take(2)}")
  }

  test("state is bounded by the log range, not the row count") {
    import spark.implicits._
    // 10k rows but values span [1, 1e4): ≤ 16·log2(1e4) + 2 ≈ 215 buckets
    val xs = (1 to 10000).map(i => ValueEvent("a", 1.0 + (i % 9973) * 1.003))
    val distinctBuckets = xs.map(v => DdSketchStream.bucketOf(v.x)).distinct.size
    assert(distinctBuckets <= 16 * (math.log(10000.0) / math.log(2.0)) + 2,
      s"bucket count $distinctBuckets exceeds the log-range bound")
  }
}
