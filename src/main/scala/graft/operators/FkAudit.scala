package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Referential-integrity audit — the RELATIONSHIP member of the
  * data-quality deck. q53's expectations check columns in isolation
  * and q31 profiles one table at a time; neither answers the question
  * that decides whether a join-shaped pipeline silently drops rows:
  * "does every fact row's foreign key RESOLVE?" One orphaned percent
  * on lineitem→orders is a one-percent revenue hole in every q1-style
  * rollup downstream — found here before the rollup ships.
  *
  * Exactness: pure integer counting — per relationship, the non-null
  * child count, the null-FK count (a DIFFERENT defect: missingness,
  * not dangling), the orphan count from an anti-join, and orphan_ppm
  * by integer floor division. Nothing to snap.
  *
  * Plan/scale: each relationship is ONE anti-join. Dimension parents
  * (nation, customer, part, supplier) broadcast; the fact-to-fact
  * lineitem→orders anti-join is the genuine 100 TB shape — a keyed
  * shuffle on the orderkey both tables already cluster by, hinted
  * shuffle_hash so neither fact side is ever broadcast. The five
  * relationship rows union value-level single-row aggregates. */
object FkAudit {

  /** One relationship audit row: child/parent frames with the key
    * columns named fk/pk, plus display names. Dimension-grade parents
    * broadcast (a shuffled anti-join on a dimension key concentrates
    * the fact side's hottest key in one task — the r11 skew class);
    * `factParent = true` switches to the shuffle_hash fact-fact
    * posture where the parent could never broadcast. */
  def auditOne(child: DataFrame, parent: DataFrame,
               rel: String, factParent: Boolean = false): DataFrame = {
    val totals = child.agg(
      expr("CAST(count(fk) AS BIGINT)").as("n_child"),
      expr("CAST(count(1) - count(fk) AS BIGINT)").as("n_null_fk"))
    val parentSide =
      if (factParent) parent.hint("shuffle_hash") else broadcast(parent)
    val orphans = child.filter(col("fk").isNotNull)
      .join(parentSide, col("fk") === col("pk"), "left_anti")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_orphans"))
    totals.crossJoin(orphans)
      .selectExpr(s"'$rel' AS relationship", "n_child", "n_null_fk",
        "n_orphans", "n_orphans * 1000000 div nullif(n_child, 0) AS orphan_ppm")
  }

  /** q288: the star schema's five edges audited in one report. */
  def starSchemaFkAudit(spark: SparkSession, dir: String): DataFrame = {
    def c(df: DataFrame, k: String) = df.selectExpr(s"$k AS fk")
    def p(df: DataFrame, k: String) = df.selectExpr(s"$k AS pk")
    Seq(
      auditOne(c(Tables.lineitem(spark, dir), "l_orderkey"),
        p(Tables.orders(spark, dir), "o_orderkey"), "lineitem->orders",
        factParent = true),
      auditOne(c(Tables.lineitem(spark, dir), "l_partkey"),
        p(Tables.part(spark, dir), "p_partkey"), "lineitem->part"),
      auditOne(c(Tables.lineitem(spark, dir), "l_suppkey"),
        p(Tables.supplier(spark, dir), "s_suppkey"), "lineitem->supplier"),
      auditOne(c(Tables.orders(spark, dir), "o_custkey"),
        p(Tables.customer(spark, dir), "c_custkey"), "orders->customer"),
      auditOne(c(Tables.customer(spark, dir), "c_nationkey"),
        p(Tables.nation(spark, dir), "n_nationkey"), "customer->nation"))
      .reduce(_.unionByName(_))
  }

  /** DuckDB twin: NOT EXISTS per edge (NULL-safe, unlike NOT IN). */
  val starSchemaFkAuditSql: String = {
    def edge(rel: String, childT: String, fk: String,
             parentT: String, pk: String): String =
      s"""SELECT '$rel' AS relationship,
         |  CAST(count($fk) AS BIGINT) AS n_child,
         |  CAST(count(*) - count($fk) AS BIGINT) AS n_null_fk,
         |  CAST((SELECT count(*) FROM $childT c
         |    WHERE c.$fk IS NOT NULL AND NOT EXISTS (
         |      SELECT 1 FROM $parentT p WHERE p.$pk = c.$fk)) AS BIGINT)
         |    AS n_orphans,
         |  CAST((SELECT count(*) FROM $childT c
         |    WHERE c.$fk IS NOT NULL AND NOT EXISTS (
         |      SELECT 1 FROM $parentT p WHERE p.$pk = c.$fk)) AS BIGINT)
         |    * 1000000 // nullif(CAST(count($fk) AS BIGINT), 0) AS orphan_ppm
         |FROM $childT""".stripMargin
    Seq(
      edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
      .mkString("\nUNION ALL\n")
  }
}
