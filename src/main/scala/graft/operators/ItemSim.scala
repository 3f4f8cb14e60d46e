package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Item–item cosine similarity — the RECOMMENDER member of the basket
  * deck. q109's association rules mine thresholded implications;
  * the workhorse of "customers also bought" is simpler and denser:
  * cos(a,b) = c_ab / √(c_a·c_b) over order co-occurrence counts, top-k
  * per item (Linden 2003's item-item CF, the binary-vector special
  * case). Registered for a deterministic probe subset of parts — the
  * q24 QueryStride discipline: the full item×item table is the
  * product no one ships; the per-item top-k list is.
  *
  * Exactness: all counts are exact BIGINTs from the q77 pair build
  * (per-order set explode — never a corpus self-join); each cosine is
  * ONE shared-text chain floored to integer micro-units, so ranking
  * (desc, neighbor-id tie-break) is an integer sort in both engines.
  *
  * Plan/scale: the q77 edge build (two shuffles: order-set collect +
  * support count), a broadcast item-total join, and a per-probe
  * window over candidate lists whose length is the probe's co-purchase
  * degree — support pruning keeps degree near-constant in corpus size
  * (the q77 argument verbatim). */
object ItemSim {

  /** Probe stride and list size. */
  val ProbeStride = 97
  val TopK = 5
  /** q77's support prune, reused verbatim. */
  val MinSupport = Triangles.MinSupport

  /** q295: top-[[TopK]] co-purchase neighbors per probe part. */
  def partItemSim(spark: SparkSession, dir: String): DataFrame = {
    val orderParts = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .groupBy("ok").agg(collect_set(col("p")).as("ps"))
      .localCheckpoint(true) // pair build + item totals share it
    val pairs = orderParts
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(expr("CAST(count(1) AS BIGINT)").as("c_ab"))
      .filter(col("c_ab") >= MinSupport)
    val totals = orderParts
      .select(explode(col("ps")).as("p"))
      .groupBy("p").agg(expr("CAST(count(1) AS BIGINT)").as("c"))
    // both orientations: the probe may sit on either side of a < b
    val cand = pairs
      .selectExpr("a AS part_id", "b AS other", "c_ab")
      .unionByName(pairs.selectExpr("b AS part_id", "a AS other", "c_ab"))
      .filter(col("part_id") % ProbeStride === 0)
      .join(broadcast(totals.selectExpr("p AS part_id", "c AS c_p")),
        "part_id")
      .join(broadcast(totals.selectExpr("p AS other", "c AS c_o")), "other")
      .withColumn("cos_micro", expr(
        "CAST(floor(CAST(c_ab AS DOUBLE)" +
          " / sqrt(CAST(c_p AS DOUBLE) * CAST(c_o AS DOUBLE)) * 1e6)" +
          " AS BIGINT)"))
    val w = Window.partitionBy("part_id")
      .orderBy(col("cos_micro").desc, col("other"))
    cand
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .selectExpr("part_id", "other AS sim_part", "rk", "c_ab",
        "round(CAST(cos_micro AS DOUBLE) / 1e6, 6) + 0.0 AS cos_sim")
  }

  /** DuckDB twin: q77's pair build, identical micro-floored ranking. */
  val partItemSimSql: String =
    s"""WITH op AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |pairs AS (
       |  SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS c_ab
       |  FROM op x JOIN op y ON x.ok = y.ok AND x.p < y.p
       |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
       |totals AS (
       |  SELECT p, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY 1),
       |cand AS (
       |  SELECT part_id, other, c_ab,
       |    CAST(floor(CAST(c_ab AS DOUBLE)
       |      / sqrt(CAST(tp.c AS DOUBLE) * CAST(tt.c AS DOUBLE)) * 1e6)
       |      AS BIGINT) AS cos_micro
       |  FROM (
       |    SELECT a AS part_id, b AS other, c_ab FROM pairs
       |    UNION ALL
       |    SELECT b AS part_id, a AS other, c_ab FROM pairs) u
       |  JOIN totals tp ON tp.p = u.part_id
       |  JOIN totals tt ON tt.p = u.other
       |  WHERE part_id % $ProbeStride = 0),
       |ranked AS (
       |  SELECT part_id, other, c_ab, cos_micro,
       |    row_number() OVER (PARTITION BY part_id
       |      ORDER BY cos_micro DESC, other) AS rk
       |  FROM cand)
       |SELECT part_id, other AS sim_part, rk, c_ab,
       |  round(CAST(cos_micro AS DOUBLE) / 1e6, 6) + 0.0 AS cos_sim
       |FROM ranked WHERE rk <= $TopK""".stripMargin
}
