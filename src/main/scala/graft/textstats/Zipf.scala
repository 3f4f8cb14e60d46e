package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Zipf-law fit per corpus slice — log-log OLS of term frequency
  * against frequency rank: natural text runs slope ≈ −1; template
  * spam flattens the head (slope → 0 over the top ranks), bot logs
  * steepen it. The corpus-health scalar completing q129's entropy
  * (which sees the whole distribution but not its SHAPE) — the pair
  * is the standard data-quality dashboard row for training mixes.
  *
  * Semantics: per slice, terms ranked by frequency desc (ties by
  * term), top `topRanks` ranks fitted: y = ln c over x = ln rank;
  * outputs slope, intercept (ln c at rank 1), and r². Slices with
  * < 3 fitted points emit NULL statistics via nullif (a 1–2 point
  * "fit" is noise).
  *
  * Exactness: each ln is snapped to the 1e-9 grid (q104), then
  * carried as INTEGER nanos; all OLS sufficient statistics are
  * DECIMAL(38,0) products/sums of those integers — bit-identical
  * operands into the shared final divides. Bounds: |ln| ≤ ~21 nats →
  * 2.1e10 nanos; squared products ≤ 4.4e20; × topRanks(500) ≤
  * 2.2e23 ≪ 10³⁸.
  *
  * Plan/scale: one (slice, term) cell aggregate (vocabulary-sized),
  * one per-slice rank window over the cells, one final aggregate —
  * the q129 backbone plus a rank window; the fact is scanned once.
  */
object Zipf {

  private def lnSnap(ratio: String): String =
    s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Per-group Zipf OLS over the top `topRanks` term frequencies. */
  def zipfFit(docs: DataFrame, groupCol: String, textCol: String,
              topRanks: Int = 500): DataFrame = {
    val cells = docs
      .select(col(groupCol).as("g"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("g", "term")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY g ORDER BY c DESC, term)"))
      .filter(col("rk") <= topRanks)
      .selectExpr("g",
        s"CAST(floor((${lnSnap("CAST(rk AS DOUBLE)")}) * 1e9) AS BIGINT) AS xn",
        s"CAST(floor((${lnSnap("CAST(c AS DOUBLE)")}) * 1e9) AS BIGINT) AS yn")
    cells.groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_terms"),
        expr("CAST(sum(CAST(xn AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sx"),
        expr("CAST(sum(CAST(yn AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sy"),
        expr("CAST(sum(CAST(xn AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0))")
          .as("sxy"),
        expr("CAST(sum(CAST(xn AS DECIMAL(38,0)) * xn) AS DECIMAL(38,0))")
          .as("sxx"),
        expr("CAST(sum(CAST(yn AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0))")
          .as("syy"))
      .selectExpr("g", "n_terms",
        "CAST(n_terms AS DOUBLE) AS nd",
        "CAST(sx AS DOUBLE) / 1e9 AS sxd", "CAST(sy AS DOUBLE) / 1e9 AS syd",
        "CAST(sxy AS DOUBLE) / 1e18 AS sxyd",
        "CAST(sxx AS DOUBLE) / 1e18 AS sxxd",
        "CAST(syy AS DOUBLE) / 1e18 AS syyd")
      .selectExpr("g", "n_terms",
        "round((nd * sxyd - sxd * syd)" +
          " / nullif(nd * sxxd - sxd * sxd, 0e0), 6) + 0.0 AS slope",
        "round((syd - sxd * ((nd * sxyd - sxd * syd)" +
          " / nullif(nd * sxxd - sxd * sxd, 0e0))) / nd, 6) + 0.0 AS intercept",
        "round(CASE WHEN n_terms >= 3 THEN" +
          " ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))" +
          " / nullif((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd), 0e0)" +
          " END, 6) + 0.0 AS r2")
  }

  /** q131: Zipf shape per document source. */
  def sourceZipf(spark: SparkSession, dir: String): DataFrame =
    zipfFit(Tables.documents(spark, dir), "source", "text")
      .withColumnRenamed("g", "source")

  val sourceZipfSql: String = {
    def lnSnapSql(ratio: String): String =
      s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
    s"""WITH cells AS (
       |  SELECT source AS g, t.term, CAST(count(*) AS BIGINT) AS c
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE t.term <> '' GROUP BY 1, 2),
       |ranked AS (
       |  SELECT g,
       |    CAST(floor((${lnSnapSql("CAST(rk AS DOUBLE)")}) * 1e9) AS BIGINT)
       |      AS xn,
       |    CAST(floor((${lnSnapSql("CAST(c AS DOUBLE)")}) * 1e9) AS BIGINT)
       |      AS yn
       |  FROM (
       |    SELECT g, c,
       |      row_number() OVER (PARTITION BY g ORDER BY c DESC, term) AS rk
       |    FROM cells)
       |  WHERE rk <= 500),
       |sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_terms,
       |    CAST(sum(CAST(xn AS HUGEINT)) AS HUGEINT) AS sx,
       |    CAST(sum(CAST(yn AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(xn AS HUGEINT) * yn) AS HUGEINT) AS sxy,
       |    CAST(sum(CAST(xn AS HUGEINT) * xn) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(yn AS HUGEINT) * yn) AS HUGEINT) AS syy
       |  FROM ranked GROUP BY 1),
       |d AS (
       |  SELECT g, n_terms, CAST(n_terms AS DOUBLE) AS nd,
       |    CAST(sx AS DOUBLE) / 1e9 AS sxd, CAST(sy AS DOUBLE) / 1e9 AS syd,
       |    CAST(sxy AS DOUBLE) / 1e18 AS sxyd,
       |    CAST(sxx AS DOUBLE) / 1e18 AS sxxd,
       |    CAST(syy AS DOUBLE) / 1e18 AS syyd
       |  FROM sums)
       |SELECT g AS source, n_terms,
       |  round((nd * sxyd - sxd * syd)
       |    / nullif(nd * sxxd - sxd * sxd, 0e0), 6) + 0.0 AS slope,
       |  round((syd - sxd * ((nd * sxyd - sxd * syd)
       |    / nullif(nd * sxxd - sxd * sxd, 0e0))) / nd, 6) + 0.0 AS intercept,
       |  round(CASE WHEN n_terms >= 3 THEN
       |    ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
       |    / nullif((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd), 0e0)
       |    END, 6) + 0.0 AS r2
       |FROM d""".stripMargin
  }
}
