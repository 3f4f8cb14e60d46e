package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Markov-chain (removal-effect) attribution — the DATA-DRIVEN member
  * completing the attribution trio: q80 credits the last touch by
  * fiat, q294 decays by recency by fiat; the Markov model (Anderl
  * 2014's removal-effect formulation) lets the JOURNEYS set the
  * weights — build the first-order transition graph over
  * start/channel/conversion/null states, compute the absorption
  * probability P(conv | start), then ask per channel: how much does
  * that probability DROP if the channel is deleted (its in-edges
  * redirected to null)? The normalized drops are the attribution
  * shares.
  *
  * Journey model: per user, a journey ends at each purchase (or at
  * history end); within a journey consecutive touches form edges,
  * start → first touch, last touch → conv/null; a touchless
  * conversion books start → conv (organic mass stays in the model).
  *
  * Exactness: transition counts are exact BIGINTs pivoted into ONE
  * row; absorption runs [[Iters]] fixed-point iterations with every
  * probability an integer in ppb and every update ONE integer
  * floor-division chain — deterministic in both engines by
  * construction (the q65 integer-mass discipline applied to an
  * absorbing chain). The iteration count is the documented truncation
  * knob: p rises monotonically toward absorption and freezes once the
  * per-step increment drops under the ppb grid; all four variants
  * truncate identically, so the removal DIFFERENCES converge faster
  * than the levels. Each Spark iteration materializes the 1-row
  * state (checkpoint) so CollapseProject cannot inline the recurrence
  * into an exponential expression tree; the DuckDB twin forces the
  * same with AS MATERIALIZED CTEs.
  *
  * Plan/scale: the DATA side is one events scan + per-user journey
  * windows (the q18/q80 class) + one keyed edge count; everything
  * after is a 1-row frame — 4 variants × [[Iters]] integer steps of
  * pure projection. */
object MarkovAttribution {

  val Iters = 48
  val Channels: Seq[String] = Seq("view", "click", "signup")
  private val Srcs: Seq[String] = "start" +: Channels
  private val Dsts: Seq[String] = Channels :+ "conv" :+ "null"

  private def cntBody(src: String, dst: String): String =
    s"CAST(coalesce(sum(CASE WHEN src = '$src' AND dst = '$dst'" +
      s" THEN n ELSE 0 END), 0) AS BIGINT)"

  private def rowSum(src: String): String =
    Dsts.map(d => s"c_${src}_$d").mkString("(", " + ", s") AS r_$src")

  /** (variant name, removed channel or "") — base first. */
  private val Variants: Seq[(String, String)] =
    ("base", "") +: Channels.map(c => (s"rm_$c", c))

  /** One absorption step for every variant; `fdiv` renders the
    * engine's integer floor division (both sides are non-negative, so
    * floor ≡ trunc and Spark `div` ≡ DuckDB `//`). */
  private def stepExprs(fdiv: (String, String) => String): Seq[String] =
    Variants.flatMap { case (v, removed) =>
      Srcs.filterNot(_ == removed).map { s =>
        val terms = Channels
          .filterNot(_ == removed)
          .map(ch => s"c_${s}_$ch * p_${v}_$ch") :+
          s"c_${s}_conv * CAST(1000000000 AS BIGINT)"
        s"CASE WHEN r_$s > 0 THEN ${fdiv(s"(${terms.mkString(" + ")})", s"r_$s")}" +
          s" ELSE CAST(0 AS BIGINT) END AS p_${v}_$s"
      }
    }

  private val InitExprs: Seq[String] =
    Variants.flatMap { case (v, removed) =>
      Srcs.filterNot(_ == removed)
        .map(s => s"CAST(0 AS BIGINT) AS p_${v}_$s")
    }

  private val CountCols: Seq[String] =
    for (s <- Srcs; d <- Dsts) yield s"c_${s}_$d"

  /** Attribution from an edge-count frame (src, dst, n). One row per
    * channel: (channel, base_conv_ppb, removal_conv_ppb, effect_ppb,
    * share_ppm). */
  def attribution(edges: DataFrame): DataFrame = {
    val aggExprs = for (s <- Srcs; d <- Dsts)
      yield expr(cntBody(s, d)).as(s"c_${s}_$d")
    val pivot = edges.agg(aggExprs.head, aggExprs.tail: _*)
      .selectExpr(CountCols ++ Srcs.map(rowSum): _*)
    val carry = CountCols ++ Srcs.map(s => s"r_$s")
    val sparkSteps = stepExprs((a, b) => s"$a div $b")
    val evolved = (1 to Iters).foldLeft(
      pivot.selectExpr(carry ++ InitExprs: _*).localCheckpoint(true)) {
      (df, _) => df.selectExpr(carry ++ sparkSteps: _*).localCheckpoint(true)
    }
    val perChannel = Channels.map { ch =>
      evolved.selectExpr(s"'$ch' AS channel",
        "p_base_start AS base_conv_ppb",
        s"p_rm_${ch}_start AS removal_conv_ppb",
        s"p_base_start - p_rm_${ch}_start AS effect_ppb")
    }.reduce(_.unionByName(_))
    perChannel
      .crossJoin(broadcast(perChannel
        .agg(expr("CAST(sum(effect_ppb) AS BIGINT)").as("e_tot"))))
      .selectExpr("channel", "base_conv_ppb", "removal_conv_ppb",
        "effect_ppb",
        "effect_ppb * 1000000 div nullif(e_tot, 0) AS share_ppm")
  }

  /** q306: the events-corpus journey graph — read beside q80 and
    * q294: three attribution models, one frame. */
  def eventMarkovAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withJr = ev
      .withColumn("jr", coalesce(sum(
        expr("CAST(event_type = 'purchase' AS BIGINT)")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .localCheckpoint(true) // touches + conversions + organic
    val touches = withJr.filter(col("event_type").isin(Channels: _*))
    val convJr = withJr.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("jr")).distinct()
      .withColumn("has_conv", lit(1))
    val wj = Window.partitionBy("user_id", "jr")
      .orderBy(col("ts"), col("event_id"))
    val walked = touches
      .withColumn("src", coalesce(lag("event_type", 1).over(wj),
        lit("start")))
      .withColumn("is_last", lead("event_type", 1).over(wj).isNull)
      .localCheckpoint(true) // in-edges + out-edges
    val inEdges = walked.selectExpr("src", "event_type AS dst")
    val outEdges = walked.filter(col("is_last"))
      .join(convJr, Seq("user_id", "jr"), "left")
      .selectExpr("event_type AS src",
        "CASE WHEN has_conv = 1 THEN 'conv' ELSE 'null' END AS dst")
    val organic = withJr.filter(col("event_type") === "purchase")
      .join(touches.select("user_id", "jr").distinct(),
        Seq("user_id", "jr"), "left_anti")
      .selectExpr("'start' AS src", "'conv' AS dst")
    attribution(inEdges.unionByName(outEdges).unionByName(organic)
      .groupBy("src", "dst")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n")))
  }

  /** DuckDB twin: identical journey windows and edge counts; the
    * absorption recurrence as [[Iters]] MATERIALIZED CTE steps with
    * the same ppb floor divisions. */
  val eventMarkovAttributionSql: String = {
    val pivotCols = (for (s <- Srcs; d <- Dsts)
      yield s"${cntBody(s, d)} AS c_${s}_$d").mkString(",\n       |    ")
    val rowSums = Srcs.map(rowSum).mkString(",\n       |    ")
    val carry = (CountCols ++ Srcs.map(s => s"r_$s")).mkString(", ")
    val init = InitExprs.mkString(",\n       |    ")
    val duckSteps = stepExprs((a, b) => s"$a // $b")
    val steps = (1 to Iters).map { i =>
      s"""it$i AS MATERIALIZED (
         |  SELECT $carry,
         |    ${duckSteps.mkString(",\n       |    ")}
         |  FROM it${i - 1})""".stripMargin
    }.mkString(",\n       |")
    val perChannel = Channels.map { ch =>
      s"""SELECT '$ch' AS channel, p_base_start AS base_conv_ppb,
         |  p_rm_${ch}_start AS removal_conv_ppb,
         |  p_base_start - p_rm_${ch}_start AS effect_ppb
         |FROM it$Iters""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id, event_type
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |with_jr AS (
       |  SELECT *, coalesce(sum(CAST(event_type = 'purchase' AS BIGINT))
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jr
       |  FROM ev),
       |touches AS (
       |  SELECT * FROM with_jr
       |  WHERE event_type IN (${Channels.map(c => s"'$c'").mkString(", ")})),
       |conv_jr AS (
       |  SELECT DISTINCT user_id, jr, 1 AS has_conv
       |  FROM with_jr WHERE event_type = 'purchase'),
       |walked AS (
       |  SELECT user_id, jr, event_type,
       |    coalesce(lag(event_type, 1) OVER wj, 'start') AS src,
       |    lead(event_type, 1) OVER wj IS NULL AS is_last
       |  FROM touches
       |  WINDOW wj AS (PARTITION BY user_id, jr ORDER BY ts, event_id)),
       |edges AS (
       |  SELECT src, event_type AS dst FROM walked
       |  UNION ALL
       |  SELECT w.event_type AS src,
       |    CASE WHEN c.has_conv = 1 THEN 'conv' ELSE 'null' END AS dst
       |  FROM walked w LEFT JOIN conv_jr c USING (user_id, jr)
       |  WHERE is_last
       |  UNION ALL
       |  SELECT 'start' AS src, 'conv' AS dst
       |  FROM with_jr p
       |  WHERE event_type = 'purchase' AND NOT EXISTS (
       |    SELECT 1 FROM touches t
       |    WHERE t.user_id = p.user_id AND t.jr = p.jr)),
       |counts AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
       |  FROM edges GROUP BY 1, 2),
       |pivoted AS (
       |  SELECT
       |    $pivotCols
       |  FROM counts),
       |it0 AS (
       |  SELECT *,
       |    $init
       |  FROM (SELECT *, $rowSums FROM pivoted)),
       |$steps,
       |shares AS (
       |$perChannel
       |),
       |etot AS (SELECT CAST(sum(effect_ppb) AS BIGINT) AS e_tot FROM shares)
       |SELECT channel, base_conv_ppb, removal_conv_ppb, effect_ppb,
       |  effect_ppb * 1000000 // nullif(e_tot, 0) AS share_ppm
       |FROM shares CROSS JOIN etot""".stripMargin
  }
}
