package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Price–volume–mix bridge — the FP&A decomposition the rollup deck
  * (q1/q43/q78) reports totals for but never EXPLAINS. "Revenue is
  * down 4% year over year" has four different fixes depending on
  * whether volume fell, realized prices fell, the sold mix shifted,
  * or products entered/exited — the bridge splits ΔR per item i with
  * average realized price p = r/q:
  *
  *   volume  = Σ (q₁−q₀)·p₀     (sold more or fewer units)
  *   price   = Σ q₀·(p₁−p₀)     (realized more or less per unit)
  *   cross   = Σ (q₁−q₀)(p₁−p₀) (the joint term, reported honestly
  *                               instead of smeared into the others)
  *   new/lost = full r₁ / −r₀ of items present in only one period
  *
  * and volume+price+cross+new+lost ≡ r₁−r₀ (the additivity identity,
  * asserted to the cent in the spec).
  *
  * Exactness: per-item q (units) and r (cents) are exact BIGINTs; p
  * is a rational of exact integers and each effect term is floored to
  * integer cents BEFORE summing (order-free; the identity then holds
  * up to one cent per matched item, measured and bounded in the
  * spec — the oracle matches bit-for-bit because both engines floor
  * identically).
  *
  * Plan/scale: one fact scan → (brand, part, period) cells → a
  * self-joined FULL OUTER pair per part (dimension-bounded) → one
  * brand rollup. */
object PriceVolumeMix {

  /** Bridge per group from item-period cells (g, item, period 0/1,
    * q BIGINT units, r BIGINT cents). One row per group. */
  def bridge(cells: DataFrame): DataFrame = {
    val p0 = cells.filter(col("period") === 0)
      .selectExpr("g", "item", "q AS q0", "r AS r0")
    val p1 = cells.filter(col("period") === 1)
      .selectExpr("g AS g1", "item AS item1", "q AS q1", "r AS r1")
    p0.join(p1, col("g") === col("g1") && col("item") === col("item1"),
      "full_outer")
      .selectExpr(
        "coalesce(g, g1) AS g",
        "coalesce(r0, CAST(0 AS BIGINT)) AS r0c",
        "coalesce(r1, CAST(0 AS BIGINT)) AS r1c",
        // matched-item effects on the cent grid; unmatched → new/lost
        "CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN" +
          " CAST(floor(CAST(q1 - q0 AS DOUBLE) * (CAST(r0 AS DOUBLE)" +
          " / CAST(q0 AS DOUBLE))) AS BIGINT) ELSE 0 END AS vol_c",
        "CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN" +
          " CAST(floor(CAST(q0 AS DOUBLE) * (CAST(r1 AS DOUBLE)" +
          " / CAST(q1 AS DOUBLE) - CAST(r0 AS DOUBLE)" +
          " / CAST(q0 AS DOUBLE))) AS BIGINT) ELSE 0 END AS price_c",
        "CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN" +
          " CAST(floor(CAST(q1 - q0 AS DOUBLE) * (CAST(r1 AS DOUBLE)" +
          " / CAST(q1 AS DOUBLE) - CAST(r0 AS DOUBLE)" +
          " / CAST(q0 AS DOUBLE))) AS BIGINT) ELSE 0 END AS cross_c",
        "CASE WHEN r0 IS NULL THEN r1 ELSE CAST(0 AS BIGINT) END AS new_c",
        "CASE WHEN r1 IS NULL THEN -r0 ELSE CAST(0 AS BIGINT) END AS lost_c")
      .groupBy("g")
      .agg(
        expr("CAST(sum(r0c) AS BIGINT)").as("rev0_cents"),
        expr("CAST(sum(r1c) AS BIGINT)").as("rev1_cents"),
        expr("CAST(sum(vol_c) AS BIGINT)").as("volume_cents"),
        expr("CAST(sum(price_c) AS BIGINT)").as("price_cents"),
        expr("CAST(sum(cross_c) AS BIGINT)").as("cross_cents"),
        expr("CAST(sum(new_c) AS BIGINT)").as("new_cents"),
        expr("CAST(sum(lost_c) AS BIGINT)").as("lost_cents"))
  }

  /** q302: the 1994→1995 revenue bridge per part brand over ship-year
    * lineitem cells. */
  def brandRevenueBridge(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull && col("l_extendedprice").isNotNull &&
        col("l_quantity").isNotNull && col("l_partkey").isNotNull)
      .selectExpr("l_partkey AS item",
        "year(CAST(l_shipdate AS DATE)) AS yr",
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(floor(l_extendedprice * 1e2) AS BIGINT) AS cents")
      .filter(col("yr").isin(1994, 1995))
      .groupBy("item", "yr")
      .agg(expr("CAST(sum(qty) AS BIGINT)").as("q"),
        expr("CAST(sum(cents) AS BIGINT)").as("r"))
      .join(broadcast(Tables.part(spark, dir)
        .selectExpr("p_partkey", "p_brand")),
        col("item") === col("p_partkey"))
      .selectExpr("p_brand AS g", "item",
        "CAST(yr = 1995 AS INT) AS period", "q", "r")
    bridge(cells).withColumnRenamed("g", "p_brand")
  }

  /** DuckDB twin: identical cells, full-outer pair, cent-floored
    * effects. */
  val brandRevenueBridgeSql: String =
    """WITH cells AS (
      |  SELECT p_brand AS g, l_partkey AS item,
      |    CAST(year(CAST(l_shipdate AS DATE)) = 1995 AS INT) AS period,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |    CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)) AS BIGINT)
      |      AS r
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
      |    AND l_quantity IS NOT NULL
      |    AND year(CAST(l_shipdate AS DATE)) IN (1994, 1995)
      |  GROUP BY 1, 2, 3),
      |p0 AS (SELECT g, item, q AS q0, r AS r0 FROM cells WHERE period = 0),
      |p1 AS (SELECT g AS g1, item AS item1, q AS q1, r AS r1
      |  FROM cells WHERE period = 1),
      |paired AS (
      |  SELECT coalesce(g, g1) AS g,
      |    coalesce(r0, CAST(0 AS BIGINT)) AS r0c,
      |    coalesce(r1, CAST(0 AS BIGINT)) AS r1c,
      |    CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN
      |      CAST(floor(CAST(q1 - q0 AS DOUBLE) * (CAST(r0 AS DOUBLE)
      |      / CAST(q0 AS DOUBLE))) AS BIGINT) ELSE 0 END AS vol_c,
      |    CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN
      |      CAST(floor(CAST(q0 AS DOUBLE) * (CAST(r1 AS DOUBLE)
      |      / CAST(q1 AS DOUBLE) - CAST(r0 AS DOUBLE)
      |      / CAST(q0 AS DOUBLE))) AS BIGINT) ELSE 0 END AS price_c,
      |    CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN
      |      CAST(floor(CAST(q1 - q0 AS DOUBLE) * (CAST(r1 AS DOUBLE)
      |      / CAST(q1 AS DOUBLE) - CAST(r0 AS DOUBLE)
      |      / CAST(q0 AS DOUBLE))) AS BIGINT) ELSE 0 END AS cross_c,
      |    CASE WHEN r0 IS NULL THEN r1 ELSE CAST(0 AS BIGINT) END AS new_c,
      |    CASE WHEN r1 IS NULL THEN -r0 ELSE CAST(0 AS BIGINT) END AS lost_c
      |  FROM p0 FULL OUTER JOIN p1 ON g = g1 AND item = item1)
      |SELECT g AS p_brand,
      |  CAST(sum(r0c) AS BIGINT) AS rev0_cents,
      |  CAST(sum(r1c) AS BIGINT) AS rev1_cents,
      |  CAST(sum(vol_c) AS BIGINT) AS volume_cents,
      |  CAST(sum(price_c) AS BIGINT) AS price_cents,
      |  CAST(sum(cross_c) AS BIGINT) AS cross_cents,
      |  CAST(sum(new_c) AS BIGINT) AS new_cents,
      |  CAST(sum(lost_c) AS BIGINT) AS lost_cents
      |FROM paired GROUP BY 1""".stripMargin
}
