package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot diff / change-data-capture audit — given yesterday's and
  * today's snapshot of a keyed table, classify every key as `added`,
  * `removed`, or `changed` (with the list of changed columns),
  * dropping the unchanged majority. This is the audit step the
  * reference's full-replace loads skip (`if_exists='replace'` loses
  * what changed); paired with [[Scd.scd2]] it is how a warehouse
  * builds history from snapshot feeds.
  *
  * Scale shape: ONE full outer join on the key (shuffle on both
  * sides), null-safe column compares (`IS DISTINCT FROM`), and a
  * projection — no windows, no second pass. At 100 TB both snapshots
  * are facts: bucket both by the key ([[graft.sinks.PartitionedParquet]])
  * and the join is co-located.
  */
object Diff {

  /** Generic snapshot diff on `key`; compares `cols` null-safely.
    * Output: (key, status, changed_cols) — `changed_cols` is the
    * comma-joined name list (empty for added/removed).
    *
    * PRECONDITION: `key` must be unique within EACH snapshot. A
    * duplicated key fans out the full-outer join (m×n rows for that
    * key) and emits multiple, potentially contradictory status rows.
    * Callers with possibly-duplicated feeds should pre-aggregate to
    * one row per key (e.g. latest by a version column) before
    * diffing; this operator deliberately does not guess a collapse
    * rule. The registered q73 key (`c_custkey`) is unique by schema. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      key: String, cols: Seq[String]): DataFrame = {
    val o = cols.foldLeft(oldSnap.select((key +: cols).map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"_o_$c")
    }.withColumnRenamed(key, "_ok")
    val n = cols.foldLeft(newSnap.select((key +: cols).map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"_n_$c")
    }.withColumnRenamed(key, "_nk")
    val changed = concat_ws(",", cols.map(c =>
      when(expr(s"_o_$c IS DISTINCT FROM _n_$c"), lit(c))): _*)
    o.join(n, col("_ok") === col("_nk"), "full_outer")
      .select(
        coalesce(col("_ok"), col("_nk")).as(key),
        when(col("_ok").isNull, "added")
          .when(col("_nk").isNull, "removed")
          .otherwise("changed").as("status"),
        when(col("_ok").isNotNull && col("_nk").isNotNull, changed)
          .otherwise(lit("")).as("changed_cols"))
      .filter(col("status") =!= "changed" || col("changed_cols") =!= "")
  }

  /** q73: diff the customer snapshot against a deterministically
    * mutated "today" snapshot (synthesized IN-QUERY, the q6 technique,
    * so both engines diff identical inputs): every 13th key deleted,
    * every 7th re-segmented, every 5th rebalanced, every 11th also
    * re-inserted under a shifted key. */
  def customerDiff(spark: SparkSession, dir: String): DataFrame = {
    val old = Tables.customer(spark, dir)
    val neu = old.filter(expr("c_custkey % 13 <> 0"))
      .selectExpr("c_custkey",
        "CASE WHEN c_custkey % 7 = 0 THEN 'RELOCATED' ELSE c_mktsegment END AS c_mktsegment",
        "CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal")
      .unionByName(
        old.filter(expr("c_custkey % 11 = 0"))
          .selectExpr("c_custkey + 1000000000 AS c_custkey",
            "'NEWCOMER' AS c_mktsegment", "c_acctbal"))
    snapshotDiff(old, neu, "c_custkey", Seq("c_mktsegment", "c_acctbal"))
  }

  val customerDiffSql: String =
    """WITH old AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
      |neu AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'RELOCATED' ELSE c_mktsegment END AS c_mktsegment,
      |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
      |  FROM customer WHERE c_custkey % 13 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000000, 'NEWCOMER', c_acctbal
      |  FROM customer WHERE c_custkey % 11 = 0),
      |joined AS (
      |  SELECT o.c_custkey AS ok, n.c_custkey AS nk,
      |    o.c_mktsegment AS os, n.c_mktsegment AS ns,
      |    o.c_acctbal AS ob, n.c_acctbal AS nb
      |  FROM old o FULL OUTER JOIN neu n ON o.c_custkey = n.c_custkey)
      |SELECT coalesce(ok, nk) AS c_custkey,
      |  CASE WHEN ok IS NULL THEN 'added'
      |       WHEN nk IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status,
      |  CASE WHEN ok IS NOT NULL AND nk IS NOT NULL THEN concat_ws(',',
      |    CASE WHEN os IS DISTINCT FROM ns THEN 'c_mktsegment' END,
      |    CASE WHEN ob IS DISTINCT FROM nb THEN 'c_acctbal' END)
      |  ELSE '' END AS changed_cols
      |FROM joined
      |WHERE NOT (CASE WHEN ok IS NULL THEN 'added'
      |                WHEN nk IS NULL THEN 'removed'
      |                ELSE 'changed' END = 'changed'
      |           AND (CASE WHEN ok IS NOT NULL AND nk IS NOT NULL THEN concat_ws(',',
      |                CASE WHEN os IS DISTINCT FROM ns THEN 'c_mktsegment' END,
      |                CASE WHEN ob IS DISTINCT FROM nb THEN 'c_acctbal' END)
      |                ELSE '' END) = '')""".stripMargin
}
