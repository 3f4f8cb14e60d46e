package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bloom-filter-accelerated membership dedup — the scale path for
  * "is this incoming document already in the corpus?" when the corpus
  * is far too large to shuffle against every delivery.
  *
  * [[Incremental]] answers the same question with bare equi-joins;
  * correct, but every batch row participates in the join. Here the
  * corpus is first folded into a Bloom filter (ONE aggregate job — the
  * same map-side-combined shape as any count), and the batch is
  * filtered by `bloom_probe` BEFORE the join: rows the filter rejects
  * are *definitely* absent (Bloom filters have no false negatives) and
  * never reach the shuffle. Only the ~dup + fpp·|batch| survivors pay
  * the confirming equi-join that removes false positives, so the
  * registered result is EXACT — the filter is pure pruning, which is
  * what makes a DuckDB oracle possible (plain md5 join, no bloom).
  *
  * This is the plan shape Spark's own `InjectRuntimeFilter` builds for
  * runtime row-group pruning, lifted to an explicit operator: the
  * internal `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions are exposed as `bloom_agg` / `bloom_probe` through
  * [[graft.Engine]]'s extension registry, and the aggregated filter
  * bytes are embedded as a foldable binary literal (the expressions
  * require a constant or scalar-subquery filter side; a literal is the
  * executed form a scalar subquery collapses to anyway). The sketch
  * travels to executors once per stage via the broadcast-backed task
  * binary.
  *
  * Scale sizing: the filter costs ~1.2 bytes/item at 3% fpp
  * (`BloomFilter.optimalNumOfBits`). `expectedItems` must be set from
  * the real corpus cardinality (a stale underestimate degrades fpp,
  * never correctness, because of the confirm join). Two practical
  * ceilings: (1) `BloomFilterAggregate` silently clamps its size args
  * with `Math.min` against
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
  * (4e6 items / 64 Mbit by default) — [[bloomBytes]] raises both for
  * the duration of its aggregate so the requested size is honored;
  * (2) the sketch travels as a binary literal, which the analyzer /
  * optimizer copy through tree transforms and serialize into the task
  * binary — practical up to the low hundreds of MB (a few 1e8 items),
  * NOT GB-scale. A 1e9-doc corpus should be probed as several
  * key-range-partitioned filters of ~1e8 items each (build per range
  * with [[bloomBytes]], OR the probes); exactness is unaffected either
  * way because the confirm join erases false positives.
  */
object Bloom {

  /** Default probe-side false-positive rate; 3% keeps the sketch near
    * 1.2 bytes/item while the confirm join erases the misses. */
  val DefaultFpp = 0.03

  /** Eagerly aggregate `keyCol` (hashed to a long) into Bloom filter
    * bytes. ONE job, map-side combined; only the sketch reaches the
    * driver. */
  def bloomBytes(df: DataFrame, keyCol: Column, expectedItems: Long,
      fpp: Double = DefaultFpp): Array[Byte] = {
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate clamps (items, bits) with Math.min against
    // these session confs — silently, so an undersized conf turns the
    // requested sketch into a saturating one (fpp → 1; results stay
    // exact only because of the confirm join). Raise both for the
    // duration of the aggregate job, then restore.
    val conf = df.sparkSession.conf
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> bits)
    // the save/raise/restore is not atomic: serialize concurrent
    // bloomBytes calls on the same session's JVM so an interleaved
    // save cannot capture another call's raised value and leave the
    // caps permanently raised after both restore. (Other queries
    // planned DURING the aggregate still see the raised caps — an
    // inherent property of session-scoped confs; callers needing full
    // isolation should use `df.sparkSession.newSession()`.)
    ConfLock.synchronized {
      val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
      try {
        keys.foreach { case (k, v) =>
          conf.set(k, math.max(v, conf.getOption(k).map(_.toLong).getOrElse(0L)).toString)
        }
        df.select(call_function("bloom_agg", xxhash64(keyCol),
            lit(expectedItems), lit(bits)).as("bf"))
          .head.getAs[Array[Byte]](0)
      } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }

  private object ConfLock

  /** Probe column: true iff `keyCol` MIGHT be in the filter (false ⇒
    * definitely absent). */
  def mightContain(bloom: Array[Byte], keyCol: Column): Column =
    call_function("bloom_probe", lit(bloom), xxhash64(keyCol))

  // ---- q59: bloom-pruned exact membership of a batch vs the corpus ----

  /** Batch convention shared with [[Incremental]]: doc_id % 10 == 0. */
  val BatchMod: Int = Incremental.BatchMod

  /** q59: for each batch document, is its text byte-identical to some
    * corpus document (md5 equality), and to which (min corpus doc_id)?
    * Bloom prunes the batch before the confirm join; the result is
    * exact (see class doc).
    *
    * Plan: corpus scan → bloom aggregate (job 1); then batch scan →
    * `bloom_probe` filter → equi-join surviving rows to the corpus md5
    * projection → left join back onto the full batch. At 100 TB the
    * corpus md5 side of the confirm join would be the precomputed
    * hash index every ingest pipeline keeps; the probe filter shrinks
    * the batch side to ~dups + 3%. (Constraint propagation also infers
    * the probe onto the corpus side of the inner join — a no-op there,
    * since every corpus key is in its own filter: one wasted
    * xxhash64+probe per corpus row, harmless to results.)
    */
  def bloomDedup(docs: DataFrame): DataFrame =
    // sizing cardinality: the UNFILTERED table count — parquet answers
    // it from footer statistics (no data scan, unlike a count on the
    // filtered corpus), and over-sizing by the batch share only lowers
    // fpp. At production scale this is the ingest ledger's number and
    // the filter itself is built once per corpus, not once per batch —
    // the prebuilt-sketch overload below is that production path.
    bloomDedup(docs, corpusBloom(docs))

  /** Build-once half of the production pattern: the corpus md5 sketch,
    * reusable across every batch probe via the [[bloomDedup]] overload. */
  def corpusBloom(docs: DataFrame): Array[Byte] =
    bloomBytes(docs.filter(col("doc_id") % BatchMod =!= 0)
        .select(md5(col("text")).as("h")),
      col("h"), docs.count(), DefaultFpp)

  /** Probe-per-batch half: identical results to the fused overload for
    * any `bloom` built over the corpus md5 keys (an UNDERSIZED or stale
    * sketch only weakens pruning — the confirm join keeps the output
    * exact as long as the sketch contains every corpus key). */
  def bloomDedup(docs: DataFrame, bloom: Array[Byte]): DataFrame = {
    val corpus = docs.filter(col("doc_id") % BatchMod =!= 0)
      .select(col("doc_id").as("cid"), md5(col("text")).as("h"))
    val batch = docs.filter(col("doc_id") % BatchMod === 0)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val confirmed = batch.filter(mightContain(bloom, col("h")))
      .join(corpus, "h")
      .groupBy("doc_id").agg(min("cid").as("matched_id"))
    batch.select(col("doc_id"))
      .join(confirmed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("matched_id").isNotNull.cast("int").as("in_corpus"),
        col("matched_id"))
  }

  def bloomDedup(spark: SparkSession, dir: String): DataFrame =
    bloomDedup(Tables.documents(spark, dir))

  /** DuckDB twin: the bloom stage is pruning-only, so the oracle is the
    * plain exact-membership join. */
  val bloomDedupSql: String =
    s"""SELECT d.doc_id,
       |  CAST(m.matched_id IS NOT NULL AS INT) AS in_corpus, m.matched_id
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $BatchMod = 0) d
       |LEFT JOIN (
       |  SELECT b.doc_id, min(c.doc_id) AS matched_id
       |  FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % $BatchMod = 0) b
       |  JOIN (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % $BatchMod <> 0) c
       |    USING (h)
       |  GROUP BY 1) m ON d.doc_id = m.doc_id""".stripMargin
}
