package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** URL canonicalization — the crawl-frontier hygiene step every
  * web-corpus pipeline runs before URL-level dedup and frontier
  * scheduling (two spellings of one resource must collide): lowercase
  * scheme+host, strip the fragment, drop scheme-default ports
  * (`:443`/`:80`), strip a leading `www.`, collapse duplicate path
  * slashes, drop the trailing slash, and remove tracking parameters
  * (`utm_*`, `fbclid`, `gclid`) while PRESERVING real params and their
  * order (param re-ordering is a policy choice, deliberately not
  * taken). Pure projection — regex/string expressions only, no UDFs,
  * no shuffle at any scale.
  *
  * Testdata has no URL column, so the registered q70 synthesizes a
  * deterministic dirty URL per `part` row IN-QUERY (the q6/q41
  * technique: same expression text on both engines), cycling through
  * case noise, default and absent ports, duplicate slashes, trailing
  * slashes, tracking params, and fragments, then canonicalizes it.
  *
  * Both engines evaluate the IDENTICAL normalization chain: every
  * stage is generated once by [[stage]] and rendered per engine
  * (Spark `selectExpr` stages ↔ DuckDB CTEs) — only lexical syntax
  * differs (backslash escaping, `'g'` flag, cast spelling); the regex
  * dialect is the Java∩RE2 common subset (no lookarounds, no
  * capture-group replacements — the q41 rule). */
object Urls {

  /** Render a regex replace for the target engine: DuckDB needs the
    * 'g' flag for replace-all (Spark is global by default) and takes
    * backslashes raw where Spark's SQL parser eats one level. */
  private def rr(duck: Boolean)(e: String, pat: String, rep: String): String = {
    val p = if (duck) pat else pat.replace("\\", "\\\\")
    if (duck) s"regexp_replace($e, '$p', '$rep', 'g')"
    else s"regexp_replace($e, '$p', '$rep')"
  }

  private def rx(duck: Boolean)(e: String, pat: String): String = {
    val p = if (duck) pat else pat.replace("\\", "\\\\")
    s"regexp_extract($e, '$p', 1)"
  }

  private def str(duck: Boolean)(e: String): String =
    if (duck) s"($e)::VARCHAR" else s"CAST($e AS STRING)"

  /** The shared stage list: (stage name, projected expressions).
    * Later stages may reference earlier stages' column names. */
  private def stage(duck: Boolean): Seq[(String, Seq[String])] = {
    val R = rr(duck) _; val X = rx(duck) _; val S = str(duck) _
    Seq(
      "dirty" -> Seq(
        "p_partkey",
        // deterministic dirty URL: case noise, maybe-default port,
        // doubled slashes, maybe trailing slash, tracking params, fragment
        "(CASE WHEN p_partkey % 2 = 0 THEN 'HTTPS' ELSE 'Http' END) || " +
          s"'://WWW.Shop' || ${S("p_partkey % 50")} || '.COM' || " +
          "(CASE WHEN p_partkey % 3 = 0 THEN ':443' WHEN p_partkey % 3 = 1 THEN ':80' ELSE '' END) || " +
          "'//catalog//' || replace(lower(p_name), ' ', '-') || " +
          "(CASE WHEN p_partkey % 4 = 0 THEN '/' ELSE '' END) || " +
          s"'?utm_source=feed&id=' || ${S("p_partkey")} || '&utm_campaign=c' || ${S("p_partkey % 7")} || " +
          s"(CASE WHEN p_partkey % 5 = 0 THEN '&fbclid=AbC' || ${S("p_partkey")} ELSE '' END) || " +
          s"(CASE WHEN p_partkey % 2 = 1 THEN '#sec' || ${S("p_partkey % 3")} ELSE '' END) AS url"),
      "defrag" -> Seq("p_partkey", "url",
        s"${R("url", "#.*", "")} AS nofrag"),
      "split" -> Seq("p_partkey", "url",
        s"lower(${X("nofrag", "^([A-Za-z]+)://")}) AS scheme",
        s"lower(${X("nofrag", "^[A-Za-z]+://([^/?#]+)")}) AS hostport",
        s"${R("nofrag", "^[A-Za-z]+://[^/?#]+", "")} AS rest"),
      "hostpath" -> Seq("p_partkey", "url", "scheme",
        s"${R(s"(CASE WHEN scheme = 'https' THEN ${R("hostport", ":443$", "")} " +
          s"WHEN scheme = 'http' THEN ${R("hostport", ":80$", "")} " +
          "ELSE hostport END)", "^www\\.", "")} AS host",
        s"${R(X("rest", "^([^?]*)"), "/{2,}", "/")} AS path0",
        s"${X("rest", "(\\?.*)")} AS query0"),
      "clean" -> Seq("p_partkey", "url", "scheme", "host",
        "(CASE WHEN path0 = '' THEN '/' " +
          s"WHEN path0 <> '/' THEN ${R("path0", "/$", "")} ELSE path0 END) AS path",
        s"${R(R("query0", "&(utm_[A-Za-z]+|fbclid|gclid)=[^&]*", ""),
          "\\?(utm_[A-Za-z]+|fbclid|gclid)=[^&]*&?", "?")} AS query1"),
      "canon" -> Seq("p_partkey", "url", "host",
        s"scheme || '://' || host || path || ${R("query1", "[?&]$", "")} AS canon_url"))
  }

  /** Canonicalize a frame carrying (p_partkey, url): the normalization
    * stages minus the synthesis stage. Idempotent — canonicalizing a
    * canonical URL is the identity (spec-asserted). */
  def canonicalize(urls: DataFrame): DataFrame =
    stage(duck = false).drop(1).foldLeft(urls) {
      case (df, (_, exprs)) => df.selectExpr(exprs: _*)
    }

  /** q70: (p_partkey, url, host, canon_url). */
  def urlCanon(spark: SparkSession, dir: String): DataFrame =
    canonicalize(Tables.part(spark, dir)
      .selectExpr(stage(duck = false).head._2: _*))

  /** DuckDB twin: the same stages as CTEs. */
  val urlCanonSql: String = {
    val stages = stage(duck = true)
    val ctes = stages.zipWithIndex.map { case ((name, exprs), i) =>
      val from = if (i == 0) "part" else stages(i - 1)._1
      s"$name AS (SELECT ${exprs.mkString(", ")} FROM $from)"
    }.mkString(",\n")
    s"WITH $ctes\nSELECT * FROM ${stages.last._1}"
  }
}
