package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cliff's delta — the EFFECT-SIZE companion of q97's Mann–Whitney:
  * the U test says whether two samples differ; δ says by HOW MUCH on
  * the only scale that survives non-normality:
  *
  *   δ = P(x > y) − P(x < y) = (gt − lt)/(n₁·n₂) ∈ [−1, 1]
  *
  * with the standard Romano et al. magnitude bands (|δ| < 0.147
  * negligible, < 0.33 small, < 0.474 medium, else large) shipped as a
  * column — the number a report quotes NEXT TO the q97 p-value (a
  * significant-but-negligible δ is the classic big-N trap).
  *
  * Exactness: EVERYTHING is integers — gt = Σ_v cx(v)·(y-count below
  * v), lt = Σ_v cx(v)·(y-count above v) from cumulative windows over
  * value cells; δ is one shared-text division of exact counts. No
  * snapping, nothing transcendental (the magnitude CASE compares the
  * unrounded ratio — both engines run identical text).
  *
  * Plan/scale: the q97/q99 sample-cell backbone verbatim — ONE
  * map-side aggregate to (group, value) cells, cumulative windows
  * bounded by VALUE CARDINALITY, one keyed finish. */
object CliffsDelta {

  private val DeltaRawSql =
    "(CAST(gt - lt AS DOUBLE) / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))"
  private val OutSql = Seq(
    s"CASE WHEN n_x > 0 AND n_y > 0 THEN round($DeltaRawSql, 6) + 0.0 END" +
      " AS cliffs_delta",
    s"CASE WHEN n_x = 0 OR n_y = 0 THEN NULL" +
      s" WHEN abs($DeltaRawSql) < 0.147 THEN 'negligible'" +
      s" WHEN abs($DeltaRawSql) < 0.33 THEN 'small'" +
      s" WHEN abs($DeltaRawSql) < 0.474 THEN 'medium'" +
      " ELSE 'large' END AS magnitude")

  /** δ of `valueCol` between `clsX` and `clsY` rows per `groupCol`.
    * One row per group: (group, n_x, n_y, cliffs_delta, magnitude). */
  def cliffsDelta(df: DataFrame, groupCol: String, classCol: String,
      clsX: String, clsY: String, valueCol: String): DataFrame = {
    val cells = df
      .filter(col(classCol).isin(clsX, clsY) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(classCol).as("cls"),
        col(valueCol).as("v"))
      .groupBy("g", "v")
      .agg(
        expr(s"CAST(sum(CASE WHEN cls = '$clsX' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cx"),
        expr(s"CAST(sum(CASE WHEN cls = '$clsY' THEN 1 ELSE 0 END) AS BIGINT)")
          .as("cy"))
    val before = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy("g")
    cells
      .withColumn("n2", sum("cy").over(all))
      .withColumn("yb", coalesce(sum("cy").over(before), lit(0L)))
      .groupBy("g")
      .agg(
        expr("CAST(sum(cx) AS BIGINT)").as("n_x"),
        expr("CAST(max(n2) AS BIGINT)").as("n_y"),
        expr("CAST(sum(CAST(cx AS DECIMAL(38,0)) * yb) AS DECIMAL(38,0))")
          .as("gt"),
        expr("CAST(sum(CAST(cx AS DECIMAL(38,0)) * (n2 - yb - cy))" +
          " AS DECIMAL(38,0))").as("lt"))
      .selectExpr(Seq(s"g AS $groupCol", "n_x", "n_y") ++ OutSql: _*)
  }

  /** q224: HOW MUCH larger do returned quantities run than accepted,
    * per ship year — the magnitude next to q97's verdict on the same
    * frame (the big-N trap made visible). */
  def lineitemCliffs(spark: SparkSession, dir: String): DataFrame =
    cliffsDelta(
      Tables.lineitem(spark, dir)
        .withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_returnflag", "R", "A", "l_quantity")

  /** DuckDB twin: identical cells, cumulative counts, and chains. */
  val lineitemCliffsSql: String =
    s"""WITH cells AS (
       |  SELECT g, v,
       |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
       |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cy
       |  FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS g,
       |          l_returnflag AS cls, l_quantity AS v
       |        FROM lineitem
       |        WHERE l_returnflag IN ('R', 'A') AND l_quantity IS NOT NULL)
       |  GROUP BY g, v),
       |marked AS (
       |  SELECT g, cx, cy,
       |    CAST(sum(cy) OVER (PARTITION BY g) AS BIGINT) AS n2,
       |    coalesce(CAST(sum(cy) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      AS yb
       |  FROM cells),
       |agg AS (
       |  SELECT g,
       |    CAST(sum(cx) AS BIGINT) AS n_x,
       |    CAST(max(n2) AS BIGINT) AS n_y,
       |    CAST(sum(CAST(cx AS HUGEINT) * yb) AS HUGEINT) AS gt,
       |    CAST(sum(CAST(cx AS HUGEINT) * (n2 - yb - cy)) AS HUGEINT) AS lt
       |  FROM marked GROUP BY g)
       |SELECT g AS ship_yr, n_x, n_y,
       |  ${OutSql.mkString(",\n  ")}
       |FROM agg""".stripMargin
}
