package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-sample Kuiper test — the ROTATION-FAIR variant of q99's KS:
  * KS reads the single worst ECDF gap, which systematically
  * under-weights differences near the support's ends and is blind to
  * a "shift mass out of the middle symmetrically" change; Kuiper's
  *
  *   V = D⁺ + D⁻ = max(F̂x − F̂y) + max(F̂y − F̂x)
  *
  * treats both tails symmetrically (and is the standard choice for
  * circular/periodic supports — hour-of-day, day-of-week — where
  * "where the support starts" must not matter).
  *
  * Exactness: the q99 program verbatim with a SIGNED max pair — both
  * suprema run over the exact integer numerators c1·n2 − c2·n1
  * (cumulative counts cross-multiplied; max/min are order-free), the
  * empty-prefix 0 is included in both maxima via greatest(·, 0)
  * AFTER aggregation (an algebraic guarantee: F̂-differences start
  * and end at 0), and V is ONE shared-text division. Empty side →
  * NULL.
  *
  * Plan/scale: identical to q99 — the cell aggregate, one cumulative
  * window bounded by value cardinality, one keyed finish. */
object Kuiper {

  private val VSql = Seq(
    "round((CAST(greatest(dpos, 0) AS DOUBLE)" +
      " + CAST(greatest(dneg, 0) AS DOUBLE))" +
      " / nullif(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE), 0e0), 6)" +
      " + 0.0 AS v_stat")

  /** V of `valueCol` between `clsX` and `clsY` per `groupCol`. One
    * row per group: (group, n_x, n_y, v_stat). */
  def kuiperTest(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame = {
    val cum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("g")
    df
      .filter(col(classCol).isin(clsX, clsY) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(classCol).as("cls"),
        col(valueCol).as("v"))
      .groupBy("g", "v")
      .agg(
        expr(s"CAST(sum(CASE WHEN cls = '$clsX' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cx"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsY' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cy"))
      .withColumn("c1", sum("cx").over(cum))
      .withColumn("c2", sum("cy").over(cum))
      .withColumn("n1", sum("cx").over(all))
      .withColumn("n2", sum("cy").over(all))
      .groupBy("g")
      .agg(
        expr("CAST(max(n1) AS BIGINT)").as("n_x"),
        expr("CAST(max(n2) AS BIGINT)").as("n_y"),
        expr("CAST(max(c1 * n2 - c2 * n1) AS BIGINT)").as("dpos"),
        expr("CAST(max(c2 * n1 - c1 * n2) AS BIGINT)").as("dneg"))
      .selectExpr(Seq(s"g AS $groupCol", "n_x", "n_y") ++ VSql: _*)
  }

  /** q229: returned vs accepted SHIP DAY-OF-WEEK profile per year —
    * a genuinely CIRCULAR support (the q99 frame's calendar cousin),
    * where Kuiper's start-point invariance is the whole point. */
  def lineitemKuiper(spark: SparkSession, dir: String): DataFrame =
    kuiperTest(
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").isNotNull)
        .withColumn("ship_yr", expr("year(l_shipdate)"))
        .withColumn("dow", expr("dayofweek(CAST(l_shipdate AS DATE))")),
      "ship_yr", "l_returnflag", "R", "A", "dow")

  /** DuckDB twin: identical cells and signed maxima. DuckDB's
    * dayofweek is 0-based where Spark's is 1-based — the twin adds 1
    * (a pure relabeling: V is start-point invariant BY CONSTRUCTION,
    * and the cells only need IDENTICAL keys, which +1 restores). */
  val lineitemKuiperSql: String =
    s"""WITH cells AS (
       |  SELECT g, v,
       |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cy
       |  FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS g,
       |          l_returnflag AS cls,
       |          dayofweek(CAST(l_shipdate AS DATE)) + 1 AS v
       |        FROM lineitem
       |        WHERE l_returnflag IN ('R', 'A') AND l_shipdate IS NOT NULL)
       |  GROUP BY g, v),
       |cum AS (
       |  SELECT g,
       |    sum(cx) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
       |    sum(cy) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
       |    sum(cx) OVER (PARTITION BY g) AS n1,
       |    sum(cy) OVER (PARTITION BY g) AS n2
       |  FROM cells),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n1) AS BIGINT) AS n_x,
       |    CAST(max(n2) AS BIGINT) AS n_y,
       |    CAST(max(c1 * n2 - c2 * n1) AS BIGINT) AS dpos,
       |    CAST(max(c2 * n1 - c1 * n2) AS BIGINT) AS dneg
       |  FROM cum GROUP BY g)
       |SELECT g AS ship_yr, n_x, n_y,
       |  ${VSql.mkString(",\n  ")}
       |FROM agg""".stripMargin
}
