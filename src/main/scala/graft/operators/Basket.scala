package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket association rules — support / confidence / lift over
  * item pairs co-occurring in a basket. The classic co-purchase
  * analysis ("customers who bought X also bought Y"), and on a
  * training-data pipeline the same machinery answers "which domains /
  * tags co-occur in a document" for mixture design.
  *
  * Semantics: a basket is the DISTINCT item set of a group key (an
  * order's distinct brands here — multiplicity inside one basket does
  * not strengthen a rule). For each unordered pair {a, b} (a < b):
  *   support    = n_pair / n_baskets
  *   conf(a→b)  = n_pair / n_a,   conf(b→a) = n_pair / n_b
  *   lift       = n_pair · n_baskets / (n_a · n_b)
  * All counts are exact BIGINTs; each measure is ONE shared-text
  * division of exactly-recovered doubles (lift's integer numerator
  * product decimal-first), so the twin hash-matches.
  *
  * Scale: the item-set frame is ONE distinct shuffle on (basket,
  * item); the pair expansion is a self-equi-join on the basket key —
  * pairs per basket are bounded by the per-basket item count (≤ the
  * order's line count, single digits on this schema), so the
  * amplification is a small constant, NOT quadratic in table size.
  * Item totals are dimension-grade (item-type cardinality) and
  * broadcast back onto the pair frame; no driver collect anywhere.
  * Hot items at 100 TB: the join key is the BASKET, not the item, so
  * a popular item never concentrates a partition — basket keys are
  * uniform by construction. */
object Basket {

  /** Association-rule frame over `df`'s (basketCol, itemCol):
    * one row per unordered item pair with counts + support /
    * confidence both directions / lift. */
  def associationRules(df: DataFrame, basketCol: String,
      itemCol: String): DataFrame = {
    // checkpoint the deduped basket frame: it feeds totals, singles,
    // and BOTH sides of the pair self-join — without it Spark re-scans
    // and re-dedupes the fact four times (no CSE across repeated
    // frames, the round-9 rule); the frame is (basket, item) pairs,
    // shuffle-sized, not fact-sized
    val baskets = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("ok"), col(itemCol).as("b"))
      .distinct()
      .localCheckpoint(true)
    val totals = baskets.agg(
      expr("CAST(count(DISTINCT ok) AS BIGINT)").as("n_baskets"))
    val singles = baskets.groupBy("b")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n"))
    val pairs = baskets.as("x")
      .join(baskets.as("y"), col("x.ok") === col("y.ok") &&
        col("x.b") < col("y.b"))
      .groupBy(col("x.b").as("brand_a"), col("y.b").as("brand_b"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_pair"))
    pairs
      .join(broadcast(singles.withColumnRenamed("n", "n_a")),
        col("brand_a") === col("b")).drop("b")
      .join(broadcast(singles.withColumnRenamed("n", "n_b")),
        col("brand_b") === col("b")).drop("b")
      .crossJoin(broadcast(totals))
      .selectExpr("brand_a", "brand_b", "n_a", "n_b", "n_pair", "n_baskets",
        "round(CAST(n_pair AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)" +
          " + 0.0 AS support",
        "round(CAST(n_pair AS DOUBLE) / CAST(n_a AS DOUBLE), 6)" +
          " + 0.0 AS conf_a_b",
        "round(CAST(n_pair AS DOUBLE) / CAST(n_b AS DOUBLE), 6)" +
          " + 0.0 AS conf_b_a",
        "round(CAST(CAST(n_pair AS DECIMAL(38,0)) * n_baskets AS DOUBLE)" +
          " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) + 0.0 AS lift")
  }

  /** q109: which part brands are co-purchased within an order, and do
    * any pairs attract (lift > 1) or repel (lift < 1)? */
  def brandRules(spark: SparkSession, dir: String): DataFrame =
    associationRules(
      Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)),
          col("l_partkey") === col("p_partkey")),
      "l_orderkey", "p_brand")

  val brandRulesSql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL),
      |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
      |  FROM baskets),
      |singles AS (SELECT b, CAST(count(*) AS BIGINT) AS n
      |  FROM baskets GROUP BY 1),
      |pairs AS (
      |  SELECT x.b AS brand_a, y.b AS brand_b,
      |    CAST(count(*) AS BIGINT) AS n_pair
      |  FROM baskets x JOIN baskets y ON x.ok = y.ok AND x.b < y.b
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, sa.n AS n_a, sb.n AS n_b, n_pair, n_baskets,
      |  round(CAST(n_pair AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)
      |    + 0.0 AS support,
      |  round(CAST(n_pair AS DOUBLE) / CAST(sa.n AS DOUBLE), 6)
      |    + 0.0 AS conf_a_b,
      |  round(CAST(n_pair AS DOUBLE) / CAST(sb.n AS DOUBLE), 6)
      |    + 0.0 AS conf_b_a,
      |  round(CAST(CAST(n_pair AS HUGEINT) * n_baskets AS DOUBLE)
      |    / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)), 6) + 0.0 AS lift
      |FROM pairs
      |JOIN singles sa ON brand_a = sa.b
      |JOIN singles sb ON brand_b = sb.b
      |CROSS JOIN tot""".stripMargin
}
