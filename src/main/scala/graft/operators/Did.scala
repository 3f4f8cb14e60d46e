package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Difference-in-differences — the 2×2 policy-evaluation estimator:
  * DiD = (ȳ treated,post − ȳ treated,pre) − (ȳ control,post −
  * ȳ control,pre), with the OLS interaction-term standard error
  * (pooled residual variance over N−4 df — exactly `lm(y ~ treat *
  * post)`'s coefficient on treat:post). The causal-inference
  * companion to q96's Welch t: Welch asks "do two groups differ",
  * DiD asks "did the TREATED group's change differ from the secular
  * trend".
  *
  * Exactness (the q96 contract): values snap per-row by a shared
  * `floor(v·scale)` text; each of the four cells crosses the engine
  * boundary as exact integers (n, Σv, Σv²) summed as DECIMAL(38,0)
  * (order-free); the estimate/SE/t are ONE shared-text double chain
  * over the recovered sums — identical IEEE ops both engines.
  * `greatest(·, 0e0)` clamps last-ulp-negative variance numerators;
  * any empty cell or zero SE → NULLs via nullif, never errors.
  *
  * Plan/scale: one scan, one 4-group aggregate folded to a single
  * row — map-side-combined, prices like any q1-class summary. */
object Did {

  /** DiD over a frame with boolean `treatCol`/`postCol` and numeric
    * `valueCol`; `scale` is the fixed-point snap (100 = cents).
    * Returns 1 row: cell counts/means, did, se, t, df. */
  def did(df: DataFrame, treatCol: String, postCol: String,
      valueCol: String, scale: Int): DataFrame = {
    val cellsOf = Seq("tp" -> "t AND p", "tr" -> "t AND NOT p",
      "cp" -> "NOT t AND p", "cn" -> "NOT t AND NOT p")
    val aggs = cellsOf.flatMap { case (cell, cond) => Seq(
      expr(s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT)")
        .as(s"n_$cell"),
      expr(s"CAST(sum(CASE WHEN $cond THEN CAST(v AS DECIMAL(38,0)) END)" +
        " AS DECIMAL(38,0))").as(s"s_$cell"),
      expr(s"CAST(sum(CASE WHEN $cond THEN CAST(v AS DECIMAL(38,0)) * v END)" +
        " AS DECIMAL(38,0))").as(s"q_$cell")) }
    val doubles = cellsOf.flatMap { case (cell, _) => Seq(
      s"CAST(n_$cell AS DOUBLE) AS n${cell}d",
      s"CAST(s_$cell AS DOUBLE) AS s${cell}d",
      s"CAST(q_$cell AS DOUBLE) AS q${cell}d") }
    def ssr(c: String) =
      s"greatest(q${c}d - s${c}d * s${c}d / nullif(n${c}d, 0e0), 0e0)"
    val means = Seq("tp", "tr", "cp", "cn")
      .map(c => s"round(s${c}d / nullif(n${c}d, 0e0) / $scale.0e0, 6)" +
        s" + 0.0 AS mean_$c")
    df.selectExpr(
        s"CAST($treatCol AS BOOLEAN) AS t",
        s"CAST($postCol AS BOOLEAN) AS p",
        s"CAST(floor($valueCol * $scale) AS BIGINT) AS v")
      .filter("t IS NOT NULL AND p IS NOT NULL AND v IS NOT NULL")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr((Seq("n_tp", "n_tr", "n_cp", "n_cn") ++ doubles): _*)
      .selectExpr((Seq("n_tp", "n_tr", "n_cp", "n_cn") ++ means ++ Seq(
        "(stpd / nullif(ntpd, 0e0) - strd / nullif(ntrd, 0e0))" +
          " - (scpd / nullif(ncpd, 0e0) - scnd / nullif(ncnd, 0e0)) AS did_c",
        s"(${ssr("tp")} + ${ssr("tr")} + ${ssr("cp")} + ${ssr("cn")})" +
          " / nullif(ntpd + ntrd + ncpd + ncnd - 4e0, 0e0) AS s2_c",
        "1e0 / nullif(ntpd, 0e0) + 1e0 / nullif(ntrd, 0e0)" +
          " + 1e0 / nullif(ncpd, 0e0) + 1e0 / nullif(ncnd, 0e0) AS hsum",
        "CAST(ntpd + ntrd + ncpd + ncnd - 4e0 AS BIGINT) AS df")): _*)
      .selectExpr("n_tp", "n_tr", "n_cp", "n_cn",
        "mean_tp", "mean_tr", "mean_cp", "mean_cn",
        s"round(did_c / $scale.0e0, 6) + 0.0 AS did",
        s"round(sqrt(s2_c * hsum) / $scale.0e0, 6) + 0.0 AS se",
        "round(did_c / nullif(sqrt(s2_c * hsum), 0e0), 6) + 0.0 AS t_stat",
        "df")
  }

  /** q119: did BUILDING-segment customers' order values move
    * differently across the 1998 boundary than everyone else's?
    * (Synthetic data — the point is the estimator, the answer is
    * ≈ 0.) */
  def segmentDid(spark: SparkSession, dir: String): DataFrame =
    did(
      Tables.orders(spark, dir).join(
        Tables.customer(spark, dir)
          .selectExpr("c_custkey", "c_mktsegment"),
        expr("o_custkey = c_custkey"))
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull
          && col("c_mktsegment").isNotNull)
        .selectExpr("c_mktsegment = 'BUILDING' AS treat",
          "year(CAST(o_orderdate AS DATE)) >= 1998 AS post",
          "o_totalprice"),
      "treat", "post", "o_totalprice", 100)

  val segmentDidSql: String = {
    def ssr(c: String) =
      s"greatest(q${c}d - s${c}d * s${c}d / nullif(n${c}d, 0e0), 0e0)"
    """WITH obs AS (
      |  SELECT c_mktsegment = 'BUILDING' AS t,
      |    year(CAST(o_orderdate AS DATE)) >= 1998 AS p,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      |    AND c_mktsegment IS NOT NULL),
      |cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
      |    CAST(sum(CASE WHEN t AND p THEN CAST(v AS HUGEINT) END) AS DECIMAL(38,0)) AS s_tp,
      |    CAST(sum(CASE WHEN t AND p THEN CAST(v AS HUGEINT) * v END) AS DECIMAL(38,0)) AS q_tp,
      |    CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
      |    CAST(sum(CASE WHEN t AND NOT p THEN CAST(v AS HUGEINT) END) AS DECIMAL(38,0)) AS s_tr,
      |    CAST(sum(CASE WHEN t AND NOT p THEN CAST(v AS HUGEINT) * v END) AS DECIMAL(38,0)) AS q_tr,
      |    CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
      |    CAST(sum(CASE WHEN NOT t AND p THEN CAST(v AS HUGEINT) END) AS DECIMAL(38,0)) AS s_cp,
      |    CAST(sum(CASE WHEN NOT t AND p THEN CAST(v AS HUGEINT) * v END) AS DECIMAL(38,0)) AS q_cp,
      |    CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS n_cn,
      |    CAST(sum(CASE WHEN NOT t AND NOT p THEN CAST(v AS HUGEINT) END) AS DECIMAL(38,0)) AS s_cn,
      |    CAST(sum(CASE WHEN NOT t AND NOT p THEN CAST(v AS HUGEINT) * v END) AS DECIMAL(38,0)) AS q_cn
      |  FROM obs),
      |d AS (
      |  SELECT n_tp, n_tr, n_cp, n_cn,
      |    CAST(n_tp AS DOUBLE) AS ntpd, CAST(s_tp AS DOUBLE) AS stpd, CAST(q_tp AS DOUBLE) AS qtpd,
      |    CAST(n_tr AS DOUBLE) AS ntrd, CAST(s_tr AS DOUBLE) AS strd, CAST(q_tr AS DOUBLE) AS qtrd,
      |    CAST(n_cp AS DOUBLE) AS ncpd, CAST(s_cp AS DOUBLE) AS scpd, CAST(q_cp AS DOUBLE) AS qcpd,
      |    CAST(n_cn AS DOUBLE) AS ncnd, CAST(s_cn AS DOUBLE) AS scnd, CAST(q_cn AS DOUBLE) AS qcnd
      |  FROM cells),
      |est AS (
      |  SELECT n_tp, n_tr, n_cp, n_cn,
      |    round(stpd / nullif(ntpd, 0e0) / 100.0e0, 6) + 0.0 AS mean_tp,
      |    round(strd / nullif(ntrd, 0e0) / 100.0e0, 6) + 0.0 AS mean_tr,
      |    round(scpd / nullif(ncpd, 0e0) / 100.0e0, 6) + 0.0 AS mean_cp,
      |    round(scnd / nullif(ncnd, 0e0) / 100.0e0, 6) + 0.0 AS mean_cn,
      |    (stpd / nullif(ntpd, 0e0) - strd / nullif(ntrd, 0e0))
      |      - (scpd / nullif(ncpd, 0e0) - scnd / nullif(ncnd, 0e0)) AS did_c,
      |    (SSR_TP + SSR_TR + SSR_CP + SSR_CN)
      |      / nullif(ntpd + ntrd + ncpd + ncnd - 4e0, 0e0) AS s2_c,
      |    1e0 / nullif(ntpd, 0e0) + 1e0 / nullif(ntrd, 0e0)
      |      + 1e0 / nullif(ncpd, 0e0) + 1e0 / nullif(ncnd, 0e0) AS hsum,
      |    CAST(ntpd + ntrd + ncpd + ncnd - 4e0 AS BIGINT) AS df
      |  FROM d)
      |SELECT n_tp, n_tr, n_cp, n_cn,
      |  mean_tp, mean_tr, mean_cp, mean_cn,
      |  round(did_c / 100.0e0, 6) + 0.0 AS did,
      |  round(sqrt(s2_c * hsum) / 100.0e0, 6) + 0.0 AS se,
      |  round(did_c / nullif(sqrt(s2_c * hsum), 0e0), 6) + 0.0 AS t_stat,
      |  df
      |FROM est"""
      .stripMargin
      .replace("SSR_TP", ssr("tp")).replace("SSR_TR", ssr("tr"))
      .replace("SSR_CP", ssr("cp")).replace("SSR_CN", ssr("cn"))
  }
}
