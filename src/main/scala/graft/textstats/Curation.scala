package graft.textstats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** End-to-end corpus curation — the composed keep/drop decision a
  * training-data pipeline actually ships: exact-dup canonicalization
  * ([[graft.dedup.Dedup.dedupExact]]), Gopher repetition filters
  * ([[TextStats.gopherRepetition]]), and the quality score
  * ([[TextStats.quality]]) joined into one verdict per document with
  * the first failing stage as the drop reason (dup > repetition >
  * quality — the conventional order: cheap exact checks first).
  *
  * The oracle still nests the component SQL the individual queries
  * hash-match (so q52 guards against the components drifting apart),
  * but the Spark plan is FUSED into a single corpus scan: md5 and the
  * quality score are computed in the scan projection and threaded
  * through the Gopher gram explode on a sentinel n=0 row per document
  * ([[TextStats.repetitionCore]]'s `carry`), and canonical resolution
  * is a window `min(doc_id) over (partition by text_hash)` on the
  * already-tiny per-doc result instead of an md5 equi-join against a
  * second dedupExact scan. The earlier 3-subplan join-on-doc_id shape
  * read `documents` 4× (~400 TB of scan for one verdict at target
  * scale); this plan reads it once and pays the same shuffle classes
  * the repetition component already paid, plus one window shuffle of
  * per-doc rows.
  */
object Curation {

  val MinQuality = 0.55

  def curate(docs: DataFrame): DataFrame = curate(docs, Nil)

  /** Curate, additionally threading caller expressions (name →
    * expression over `docs`) through the SINGLE corpus scan — the q142
    * pipeline carries lang/source/n_tok this way so downstream stages
    * (mix, pack) never rescan the fact. */
  def curate(docs: DataFrame, extras: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // md5 carried as two 60-bit long halves (120 bits — same collision
    // class as the full digest for grouping purposes): a string carry
    // would force the big (doc,n,g) gram count into SortAggregate
    // (string agg buffers aren't hash-aggregable); longs keep it a
    // map-side-combined HashAggregate.
    val h = md5(col("text"))
    val base = docs.select(Seq(
      col("doc_id"),
      split(col("text"), " ").as("ws"),
      conv(substring(h, 1, 15), 16, 10).cast("long").as("th1"),
      conv(substring(h, 16, 15), 16, 10).cast("long").as("th2"),
      TextStats.qualityScoreExpr(col("text")).as("quality_score")) ++
      extras.map { case (n, c) => c.as(n) }: _*)
    TextStats.repetitionCore(base,
        carry = Seq("th1", "th2", "quality_score") ++ extras.map(_._1))
      .withColumn("canonical_id",
        min(col("doc_id")).over(Window.partitionBy(col("th1"), col("th2"))))
      .withColumn("drop_reason",
        when(col("doc_id") =!= col("canonical_id"), "dup")
          .when(col("repetition_pass") === 0, "repetition")
          .when(col("quality_score") < MinQuality, "quality"))
      .withColumn("keep", col("drop_reason").isNull.cast("int"))
      .select(Seq(col("doc_id"), col("keep"), col("drop_reason"),
        col("canonical_id"), col("quality_score")) ++
        extras.map(e => col(e._1)): _*)
  }

  def curate(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir))

  /** DuckDB twin: nests the SAME component oracles (exact-dup,
    * repetition, quality) as subqueries and applies the identical
    * verdict chain. */
  /** q330 — pipeline ORDER-SENSITIVITY audit (round-16 widening): a
    * curation chain can dedup BEFORE the repetition/quality filters
    * (the q52 precedence) or AFTER them, and on NEAR-dup groups the
    * two orders genuinely differ — members have different bytes, so a
    * group whose canonical (min doc_id) copy fails a filter goes
    * EXTINCT under dedup-first while filter-first keeps the group's
    * best PASSING copy. (On exact-hash groups the orders provably
    * agree: the filters are pure functions of the text.) Groups here
    * are q21's SimHash fingerprints — the near-dup key the engine
    * already computes — and the row reports the kept counts under both
    * orders, the docs filter-first rescues, and the near-dup groups it
    * recovers from extinction: the pipeline-design decision as a
    * measured number instead of folklore. */
  def orderAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col("doc_id"),
      split(col("text"), " ").as("ws"),
      TextStats.qualityScoreExpr(col("text")).as("quality_score"))
    val per0 = TextStats.repetitionCore(base, carry = Seq("quality_score"))
      .withColumn("pass",
        (col("repetition_pass") === 1 &&
          col("quality_score") >= MinQuality).cast("int"))
    val grp = Window.partitionBy(col("simhash"))
    val per = per0
      .join(graft.dedup.Dedup.dedupSimhash(docs), Seq("doc_id"))
      .withColumn("canonical_all", min(col("doc_id")).over(grp))
      .withColumn("canonical_pass",
        min(when(col("pass") === 1, col("doc_id"))).over(grp))
    per.agg(
      expr("CAST(count(1) AS BIGINT)").as("n_docs"),
      expr("CAST(sum(CASE WHEN doc_id = canonical_all AND pass = 1" +
        " THEN 1 ELSE 0 END) AS BIGINT)").as("kept_dedup_first"),
      expr("CAST(sum(CASE WHEN doc_id = canonical_pass" +
        " THEN 1 ELSE 0 END) AS BIGINT)").as("kept_filter_first"),
      expr("CAST(sum(CASE WHEN doc_id = canonical_pass" +
        " AND NOT (doc_id = canonical_all AND pass = 1)" +
        " THEN 1 ELSE 0 END) AS BIGINT)").as("rescued_docs"),
      expr("CAST(count(DISTINCT CASE WHEN doc_id = canonical_pass" +
        " AND canonical_pass <> canonical_all" +
        " THEN simhash END) AS BIGINT)").as("groups_recovered"))
  }

  def orderAudit(spark: SparkSession, dir: String): DataFrame =
    orderAudit(graft.Tables.documents(spark, dir))

  /** DuckDB twin of [[orderAudit]]: the same component oracles (q21
    * SimHash groups, q40 repetition, q27 quality), both order chains
    * as window expressions. */
  val orderAuditSql: String =
    s"""WITH rep AS (
       |  SELECT doc_id, repetition_pass
       |  FROM (${TextStats.gopherRepetitionSql.replace("\n", " ")})),
       |qual AS (
       |  SELECT doc_id, quality_score
       |  FROM (${TextStats.qualitySql.replace("\n", " ")})),
       |sims AS (
       |  SELECT doc_id, simhash
       |  FROM (${graft.dedup.Dedup.dedupSimhashSql.replace("\n", " ")})),
       |per AS (
       |  SELECT s.doc_id, s.simhash,
       |    CAST(rep.repetition_pass = 1
       |      AND qual.quality_score >= $MinQuality AS INT) AS pass,
       |    min(s.doc_id) OVER (PARTITION BY s.simhash) AS canonical_all,
       |    min(CASE WHEN rep.repetition_pass = 1
       |          AND qual.quality_score >= $MinQuality
       |          THEN s.doc_id END)
       |      OVER (PARTITION BY s.simhash) AS canonical_pass
       |  FROM sims s JOIN rep USING (doc_id) JOIN qual USING (doc_id))
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN doc_id = canonical_all AND pass = 1
       |    THEN 1 ELSE 0 END) AS BIGINT) AS kept_dedup_first,
       |  CAST(sum(CASE WHEN doc_id = canonical_pass
       |    THEN 1 ELSE 0 END) AS BIGINT) AS kept_filter_first,
       |  CAST(sum(CASE WHEN doc_id = canonical_pass
       |    AND NOT (doc_id = canonical_all AND pass = 1)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS rescued_docs,
       |  CAST(count(DISTINCT CASE WHEN doc_id = canonical_pass
       |    AND canonical_pass <> canonical_all
       |    THEN simhash END) AS BIGINT) AS groups_recovered
       |FROM per""".stripMargin

  val curateSql: String =
    s"""WITH canon AS (
       |  SELECT d.doc_id, e.canonical_id
       |  FROM (SELECT doc_id, md5(text) AS text_hash FROM documents) d
       |  JOIN (SELECT * FROM (${Dedup.dedupExactSql.replace("\n", " ")})) e
       |    USING (text_hash)),
       |rep AS (
       |  SELECT doc_id, repetition_pass
       |  FROM (${TextStats.gopherRepetitionSql.replace("\n", " ")})),
       |qual AS (
       |  SELECT doc_id, quality_score
       |  FROM (${TextStats.qualitySql.replace("\n", " ")})),
       |verdict AS (
       |  SELECT canon.doc_id, canon.canonical_id, rep.repetition_pass, qual.quality_score,
       |    CASE WHEN canon.doc_id <> canon.canonical_id THEN 'dup'
       |         WHEN rep.repetition_pass = 0 THEN 'repetition'
       |         WHEN qual.quality_score < $MinQuality THEN 'quality'
       |    END AS drop_reason
       |  FROM canon JOIN rep USING (doc_id) JOIN qual USING (doc_id))
       |SELECT doc_id, CAST(drop_reason IS NULL AS INT) AS keep, drop_reason,
       |  canonical_id, quality_score
       |FROM verdict""".stripMargin
}
