package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DdSketch

/** Streaming DDSketch — the continuous twin of
  * [[graft.operators.DdSketch]] (q260), completing the sketch deck's
  * streaming symmetry (18w HLL, CMS, now quantiles): per group the
  * state is the log-bucket count map — bounded by the VALUE RANGE
  * (≈ B·log₂(max/min) entries, ~300 for any price/latency domain),
  * never by stream length — and each trigger re-emits the current
  * quantile readout per requested p (Update mode).
  *
  * Delivery contract: bucket counts ADD (order-free mergeable, so NO
  * ordering contract — but unlike the HLL twin's idempotent max,
  * addition double-counts duplicate redelivery; feed exactly-once or
  * dedup upstream, the CountMin twin's contract).
  *
  * The bucket/estimate program is the batch one verbatim on JVM
  * primitives — the same 1e-9 ln snap, the same B/ln2 multiplier, the
  * same exact power-of-two × pinned-root estimate — so a replay of
  * any frame equals the batch [[DdSketch.quantiles]] readout EXACTLY
  * (DdSketchStreamSpec pins frame equality against q260's machinery).
  */
object DdSketchStream {

  case class ValueEvent(g: String, x: Double)
  case class SketchState(counts: Map[Long, Long])
  /** Same shape as the batch quantile readout (pre-join columns). */
  case class QuantileEstimate(g: String, p: Double, n: Long, i: Long,
      est: Double)

  /** Batch [[DdSketch.bucketOf]] on JVM primitives. */
  private[graft] def bucketOf(x: Double): Long = {
    val snap = math.floor(math.log(x) * 1e9 + 0.5) / 1e9
    math.max(math.ceil(snap * DdSketch.IdxMul).toLong, 1L)
  }

  /** Batch [[DdSketch.estimateOf]] on JVM primitives. */
  private[graft] def estimateOf(i: Long): Double = {
    val e = 2L * i - 1L
    val twoB = 2L * DdSketch.SubBuckets
    math.pow(2.0, (e / twoB).toDouble) * DdSketch.Roots((e % twoB).toInt)
  }

  /** Batch quantile rule on the state map: smallest bucket whose
    * cumulative count reaches ⌈p·n⌉. */
  private[graft] def quantilesOf(g: String, counts: Map[Long, Long],
      ps: Seq[Double]): Seq[QuantileEstimate] = {
    val n = counts.valuesIterator.sum
    val sorted = counts.toSeq.sortBy(_._1)
    ps.map { p =>
      val r = math.ceil(p * n).toLong
      var cum = 0L
      val i = sorted.find { case (_, c) => cum += c; cum >= r }
        .map(_._1).getOrElse(sorted.last._1)
      QuantileEstimate(g, p, n, i, estimateOf(i))
    }
  }

  /** Per-group running quantile estimates, refreshed each trigger. */
  def ddSketchStream(events: Dataset[ValueEvent],
      ps: Seq[Double] = DdSketch.Ps): Dataset[QuantileEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (g: String, rows: Iterator[ValueEvent], state: GroupState[SketchState]) => {
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
          rows.foreach { r =>
            val b = bucketOf(r.x)
            counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
          }
          state.update(SketchState(counts))
          quantilesOf(g, counts, ps).iterator
        })
  }

  /** q335 — the DDSketch stream EXECUTED under the driver's full-hash
    * gate (r16 verdict #3; the q325 replay pattern): q260's value rows
    * replayed in a deterministic scramble over three micro-batches —
    * NO duplicate redelivery (bucket counts ADD; the additive contract
    * documented above — order freedom is the gated replay claim). The
    * final per-(g, p) emission carries the stream's own n and
    * estimate; the exact type-1 quantile recomputes batch-side (the
    * q260 value-cell program) and joins for q260's exact column set —
    * oracle verbatim.
    *
    * Scale note (q259 doctrine): the collect/feed is the harness; the
    * operator's state is the log-bucket count map, bounded by the
    * VALUE RANGE, never by stream length — that is the 100 TB path. */
  def replayDdSketch(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val rows = graft.Tables.orders(spark, dir)
        .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x"),
          col("o_orderkey").as("k"))
        .localCheckpoint(true) // feed + exact audit share the scan
      val feed = Replay.knuthSorted(
        rows.select(col("g"), col("x"), col("k").cast("long"))
          .as[(String, Double, Long)].collect())(
        r => r._3 * 2654435761L % 1000003) // the q259 scramble
        .map { case (g, x, _) => ValueEvent(g, x) }
      val tag = java.util.UUID.randomUUID().toString.takeWhile(_ != '-')
      val name = s"q335_dds_$tag"
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ValueEvent]
      val q = ddSketchStream(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      val finals: Seq[(String, Double, Long, Double)] =
        try {
          feed.grouped(math.max(1, (feed.length + 2) / 3)).foreach { b =>
            input.addData(b.toSeq); q.processAllAvailable()
          }
          spark.table(name).collect().zipWithIndex
            .groupBy(r => (r._1.getString(0), r._1.getDouble(1)))
            .map { case ((g, p), vs) =>
              val r = vs.maxBy(_._2)._1
              (g, p, r.getLong(r.fieldIndex("n")),
                r.getDouble(r.fieldIndex("est")))
            }.toSeq
        } finally { q.stop(); spark.catalog.dropTempView(name) }
      val est = finals.toDF("g", "p", "n", "est")
      // exact type-1 quantile over value cells — the q260 program
      val cells = rows.groupBy("g", "x").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("g")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells.withColumn("cumc", sum(col("c")).over(wCum))
      val ns = rows.groupBy("g").agg(count(lit(1)).as("n_b"))
      val exact = ns.select(col("g"), explode(typedLit(DdSketch.Ps)).as("p"),
          ceil(col("p") * col("n_b")).cast("long").as("r"))
        .join(cum, "g")
        .filter(col("cumc") >= col("r"))
        .groupBy(col("g"), col("p"))
        .agg(min(col("x")).as("exact"))
      est.join(exact, Seq("g", "p"))
        .select(col("g"), (round(col("p"), 2) + 0.0).as("p"), col("n"),
          (round(col("est"), 6) + 0.0).as("est"),
          col("exact"),
          (round((col("est") - col("exact")) / col("exact"), 6) + 0.0)
            .as("rel_err"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  /** DuckDB twin of [[replayDdSketch]]: q260's own oracle verbatim. */
  val replayDdSketchSql: String =
    graft.operators.DdSketch.orderPriceDdSketchSql
}
