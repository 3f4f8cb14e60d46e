package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Change-feed application (MERGE INTO semantics) — fold a CDC log of
  * insert/update/delete operations into a base snapshot to produce the
  * next snapshot. This is the engine-side half of warehouse ingestion:
  * [[Diff.snapshotDiff]] derives a change feed from two snapshots;
  * this operator applies one. Paired with [[graft.sinks.ReplaceSink]]
  * the two give the full replace-load round trip with history
  * ([[Scd.scd2]]) or without.
  *
  * Semantics: changes carry a total-order `lsn` (log sequence number —
  * what every CDC source provides); per key the HIGHEST-lsn change
  * wins outright (I/U upsert the payload, D deletes), keys without
  * changes pass through. A key may appear many times in the feed —
  * only the latest matters, which is why the reduction is `max_by`
  * over lsn: a map-side-combinable aggregate, so a hot key's change
  * history collapses per partition BEFORE the shuffle (never a
  * per-key window over the raw log).
  *
  * PRECONDITION: `lsn` must be unique per key (true of any real log's
  * sequence numbers); ties would make `max_by` arrival-order-dependent.
  *
  * Scale shape: one map-side-combined aggregate over the feed + ONE
  * full-outer key join against the base — both co-located when base
  * and feed are bucketed by key ([[graft.sinks.PartitionedParquet]]).
  */
object Cdc {

  /** Apply a change feed to a base snapshot.
    * @param base    snapshot with `key` + `cols`
    * @param changes feed with `key`, `lsn` (LONG, unique per key),
    *                `op` ('I' | 'U' | 'D'), and `cols` payload
    * @return the next snapshot: `key` + `cols`.
    * @note `_ck`, `_op`, `_payload`, `_base` are reserved internal
    *       names — a payload column with one of those names would
    *       collide; rename before calling. */
  def applyChanges(base: DataFrame, changes: DataFrame,
      key: String, cols: Seq[String]): DataFrame = {
    val latest = changes.groupBy(col(key).as("_ck"))
      .agg(max_by(struct((Seq("op") ++ cols).map(col): _*), col("lsn")).as("_c"))
      .select(col("_ck"), col("_c.op").as("_op"),
        struct(cols.map(c => col(s"_c.$c").as(c)): _*).as("_payload"))
    base
      .select(col(key), struct(cols.map(col): _*).as("_base"))
      .join(latest, col(key) === col("_ck"), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(
        (coalesce(col(key), col("_ck")).as(key) +:
          cols.map(c => when(col("_op").isNotNull, col(s"_payload.$c"))
            .otherwise(col(s"_base.$c")).as(c))): _*)
  }

  /** q84: apply a deterministically synthesized CDC log (the q73
    * technique — both engines fold the identical feed) to the customer
    * snapshot: two update waves with a later wave overriding, a delete
    * wave that outranks both, and an insert wave under shifted keys. */
  def customerApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val u1 = base.filter(expr("c_custkey % 4 = 0"))
      .selectExpr("c_custkey", "CAST(1 AS BIGINT) AS lsn", "'U' AS op",
        "'WAVE1' AS c_mktsegment",
        "round(c_acctbal + 10.0, 4) + 0.0 AS c_acctbal")
    val u2 = base.filter(expr("c_custkey % 8 = 0"))
      .selectExpr("c_custkey", "CAST(2 AS BIGINT) AS lsn", "'U' AS op",
        "'WAVE2' AS c_mktsegment",
        "round(c_acctbal + 20.0, 4) + 0.0 AS c_acctbal")
    val d = base.filter(expr("c_custkey % 6 = 0"))
      .selectExpr("c_custkey", "CAST(3 AS BIGINT) AS lsn", "'D' AS op",
        "CAST(NULL AS STRING) AS c_mktsegment",
        "CAST(NULL AS DOUBLE) AS c_acctbal")
    val ins = base.filter(expr("c_custkey % 10 = 0"))
      .selectExpr("c_custkey + 2000000000 AS c_custkey", "CAST(1 AS BIGINT) AS lsn", 
        "'I' AS op", "'FRESH' AS c_mktsegment",
        "round(c_acctbal, 4) + 0.0 AS c_acctbal")
    val feed = u1.unionByName(u2).unionByName(d).unionByName(ins)
    applyChanges(
      base.selectExpr("c_custkey", "c_mktsegment",
        "round(c_acctbal, 4) + 0.0 AS c_acctbal"),
      feed, "c_custkey", Seq("c_mktsegment", "c_acctbal"))
  }

  /** DuckDB twin. NOTE an engine asymmetry the registered feed never
    * exercises: Spark reduces each key with ONE atomic
    * `max_by(struct(...), lsn)` (all payload columns come from the same
    * winning change), while the twin's per-column `arg_max` SKIPS rows
    * whose value argument is NULL — on a feed where the highest-lsn
    * I/U change carried NULL payload fields, the twin would stitch
    * columns from DIFFERENT changes. Safe here because only deletes
    * carry NULL payloads and those rows are filtered before the
    * stitch; a generic twin would pack the payload into a single
    * arg_max over a struct instead. */
  val customerApplySql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_mktsegment, round(c_acctbal, 4) + 0.0 AS c_acctbal
      |  FROM customer),
      |feed AS (
      |  SELECT c_custkey, 1 AS lsn, 'U' AS op, 'WAVE1' AS c_mktsegment,
      |    round(c_acctbal + 10.0, 4) + 0.0 AS c_acctbal
      |  FROM base WHERE c_custkey % 4 = 0
      |  UNION ALL
      |  SELECT c_custkey, 2, 'U', 'WAVE2', round(c_acctbal + 20.0, 4) + 0.0
      |  FROM base WHERE c_custkey % 8 = 0
      |  UNION ALL
      |  SELECT c_custkey, 3, 'D', NULL, NULL
      |  FROM base WHERE c_custkey % 6 = 0
      |  UNION ALL
      |  SELECT c_custkey + 2000000000, 1, 'I', 'FRESH',
      |    round(c_acctbal, 4) + 0.0
      |  FROM base WHERE c_custkey % 10 = 0),
      |latest AS (
      |  SELECT c_custkey AS ck,
      |    arg_max(op, lsn) AS op,
      |    arg_max(c_mktsegment, lsn) AS seg,
      |    arg_max(c_acctbal, lsn) AS bal
      |  FROM feed GROUP BY 1)
      |SELECT coalesce(b.c_custkey, l.ck) AS c_custkey,
      |  CASE WHEN l.op IS NOT NULL THEN l.seg ELSE b.c_mktsegment END AS c_mktsegment,
      |  CASE WHEN l.op IS NOT NULL THEN l.bal ELSE b.c_acctbal END AS c_acctbal
      |FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.ck
      |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin
}
