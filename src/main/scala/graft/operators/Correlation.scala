package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Correlation matrix — Pearson r and tie-corrected Spearman ρ for
  * every pair of measures, in ONE aggregate pass over the fact table.
  * The reference computes exactly this kind of bivariate association
  * for its analysis layer (`run_analysis.Rmd` regression/EDA); here it
  * is the engine-level operator with the q32 exactness contract:
  * order-dependent double sums never cross an engine boundary.
  *
  * Exactness: every per-row term (value, value², cross product — and
  * the same over ranks) is snapped to an integer via a SHARED
  * `floor(expr)` text and summed as DECIMAL(38,0) — exact and
  * order-free on both engines — then the classic
  * (n·Σab − Σa·Σb) / (√(n·Σaa − Σa²)·√(n·Σbb − Σb²)) formula runs as
  * shared SQL text on the recovered doubles, so every FP operation has
  * identical operand order. Values are pre-scaled by 1e4 (exact-cents
  * trick), keeping all products exactly representable (≤ 5e8).
  *
  * Spearman = Pearson over tie-averaged ranks, which with ties is the
  * textbook tie-corrected ρ. Ranks are carried as 2·avgRank =
  * 2·cumex + cnt + 1 (integer, no halves) — a constant affine change
  * that cancels in ρ. The rank map is built per column from the
  * VALUE-LEVEL count aggregate: its window runs over distinct values,
  * so it is bounded by value cardinality (the registered columns have
  * ≤ 50 distinct values), not row count, and the corpus picks ranks up
  * via broadcast equi-joins — quantize continuous columns first (q47's
  * binning) before asking for rank statistics at 100 TB.
  *
  * Plan: 3 broadcast joins (each against a ≤-cardinality rank map) +
  * ONE map-side-combined aggregate producing 19 exact sums; the 1-row
  * result is localCheckpointed and fanned out into the 3 matrix rows,
  * so the fact table is scanned once.
  */
object Correlation {

  /** Fixed-point pre-scale for raw values (exact at 4 decimals). */
  val ValScale = 10000L

  private val VarNames = Seq("q" -> "quantity", "d" -> "discount", "t" -> "tax")
  private val SrcCols = Map("q" -> "l_quantity", "d" -> "l_discount", "t" -> "l_tax")
  private val VarPairs = Seq(("q", "d"), ("q", "t"), ("d", "t"))

  /** Snapped/rank column names: vq vd vt rq rd rt. */
  private val Cols = VarNames.map("v" + _._1) ++ VarNames.map("r" + _._1)

  /** (sum-name, per-row double expr) — shared between engines. */
  private val TermExprs: Seq[(String, String)] =
    Cols.map(c => (s"s_$c", c)) ++
      Cols.map(c => (s"s_${c}_$c", s"$c * $c")) ++
      VarPairs.flatMap { case (a, b) =>
        Seq((s"s_v${a}_v$b", s"v$a * v$b"), (s"s_r${a}_r$b", s"r$a * r$b"))
      }

  /** Shared ρ text over recovered double sums (round-4, −0.0-proofed).
    * nullif: a zero-variance column has no defined correlation — NULL,
    * not an ANSI divide-by-zero (integer-snapped sums make the zero
    * EXACT, so this is reachable, unlike float-noise variances). */
  private def rhoSql(sa: String, sb: String, sab: String,
      saa: String, sbb: String): String =
    s"round((nd * $sab - $sa * $sb) / " +
      s"nullif(sqrt(nd * $saa - $sa * $sa) * sqrt(nd * $sbb - $sb * $sb), 0.0), 4) + 0.0"

  /** 2·avgRank per distinct value of `src` (integer; window over the
    * value-level aggregate — cardinality-bounded, never row-bounded). */
  private def rankMap(fact: DataFrame, src: String): DataFrame = {
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fact.groupBy(col(src).as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cumex", coalesce(sum("cnt").over(w), lit(0L)))
      .select(col("v"), (lit(2L) * col("cumex") + col("cnt") + 1L)
        .cast("double").as("r2"))
  }

  /** q68: (var_a, var_b, n_rows, pearson_r, spearman_rho) for each of
    * the three measure pairs. */
  def corrMatrix(fact: DataFrame): DataFrame = {
    val prep0 = fact.select(SrcCols.values.toSeq.map(col): _*)
    val prep = VarNames.foldLeft(prep0) { case (df, (v, _)) =>
      df.join(broadcast(rankMap(fact, SrcCols(v))
          .withColumnRenamed("v", s"_v$v").withColumnRenamed("r2", s"r$v")),
        col(SrcCols(v)) === col(s"_v$v"))
    }.select(
      VarNames.map { case (v, _) =>
        expr(s"floor(${SrcCols(v)} * $ValScale.0)").as(s"v$v")
      } ++ VarNames.map { case (v, _) => col(s"r$v") }: _*)
    val stats = prep.agg(
      count(lit(1)).as("n_rows"),
      TermExprs.map { case (n, t) =>
        expr(s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0))").as(n)
      }: _*)
      .localCheckpoint(true) // 1 row; fan out 3 matrix rows, scan once
    val recovered = stats.select(
      col("n_rows") +: expr("CAST(n_rows AS DOUBLE)").as("nd") +:
        TermExprs.map { case (n, _) => expr(s"CAST($n AS DOUBLE)").as(n) }: _*)
    val rows = VarPairs.map { case (a, b) =>
      recovered.selectExpr(
        s"'${VarNames.toMap.apply(a)}' AS var_a",
        s"'${VarNames.toMap.apply(b)}' AS var_b",
        "n_rows",
        s"${rhoSql(s"s_v$a", s"s_v$b", s"s_v${a}_v$b", s"s_v${a}_v$a", s"s_v${b}_v$b")} AS pearson_r",
        s"${rhoSql(s"s_r$a", s"s_r$b", s"s_r${a}_r$b", s"s_r${a}_r$a", s"s_r${b}_r$b")} AS spearman_rho")
    }
    rows.reduce(_ unionByName _)
  }

  def corrMatrix(spark: SparkSession, dir: String): DataFrame =
    corrMatrix(Tables.lineitem(spark, dir))

  /** DuckDB twin: identical rank maps, identical snapped terms,
    * identical shared ρ text. */
  val corrMatrixSql: String = {
    val rankCtes = VarNames.map { case (v, _) =>
      s"""rm$v AS (
         |  SELECT v, CAST(2 * cumex + cnt + 1 AS DOUBLE) AS r$v FROM (
         |    SELECT v, cnt, coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumex
         |    FROM (SELECT ${SrcCols(v)} AS v, count(*) AS cnt
         |          FROM lineitem GROUP BY 1)))""".stripMargin
    }.mkString(",\n")
    val prepCols = (VarNames.map { case (v, _) =>
      s"floor(${SrcCols(v)} * $ValScale.0) AS v$v"
    } ++ VarNames.map { case (v, _) => s"rm$v.r$v AS r$v" }).mkString(", ")
    val joins = VarNames.map { case (v, _) =>
      s"JOIN rm$v ON ${SrcCols(v)} = rm$v.v"
    }.mkString(" ")
    val sums = TermExprs.map { case (n, t) =>
      s"CAST(sum(CAST(floor($t) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS $n"
    }.mkString(",\n    ")
    val recov = TermExprs.map { case (n, _) => s"CAST($n AS DOUBLE) AS $n" }
      .mkString(", ")
    val rows = VarPairs.map { case (a, b) =>
      s"""SELECT '${VarNames.toMap.apply(a)}' AS var_a,
         |  '${VarNames.toMap.apply(b)}' AS var_b, n_rows,
         |  ${rhoSql(s"s_v$a", s"s_v$b", s"s_v${a}_v$b", s"s_v${a}_v$a", s"s_v${b}_v$b")} AS pearson_r,
         |  ${rhoSql(s"s_r$a", s"s_r$b", s"s_r${a}_r$b", s"s_r${a}_r$a", s"s_r${b}_r$b")} AS spearman_rho
         |FROM recovered""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH
       |$rankCtes,
       |prep AS (
       |  SELECT $prepCols FROM lineitem $joins),
       |stats AS (
       |  SELECT count(*) AS n_rows,
       |    $sums
       |  FROM prep),
       |recovered AS (
       |  SELECT n_rows, CAST(n_rows AS DOUBLE) AS nd, $recov FROM stats)
       |$rows""".stripMargin
  }
}
