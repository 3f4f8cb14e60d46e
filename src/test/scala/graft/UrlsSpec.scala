package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Urls

/** URL-canonicalization invariants. Value-level equivalence vs the
  * DuckDB CTE twin runs through graft.Verify + tools/verify_local.py. */
class UrlsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("known dirty forms canonicalize to the expected URL") {
    import spark.implicits._
    val cases = Seq(
      (1L, "HTTPS://WWW.Example.COM:443//a//b/?utm_source=x&id=7#frag",
        "https://example.com/a/b?id=7"),
      (2L, "Http://Site.ORG:80/path/", "http://site.org/path"),
      (3L, "http://site.org:8080/x", "http://site.org:8080/x"), // non-default port kept
      (4L, "https://h.io?utm_campaign=c&fbclid=z", "https://h.io/"),
      (5L, "https://h.io/p?a=1&gclid=g&b=2", "https://h.io/p?a=1&b=2"))
    val got = Urls.canonicalize(cases.map(c => (c._1, c._2)).toDF("p_partkey", "url"))
      .select("p_partkey", "canon_url").as[(Long, String)].collect().toMap
    cases.foreach { case (k, _, want) => assert(got(k) == want, s"case $k") }
  }

  test("q70 output carries no case noise, default ports, tracking, or fragments") {
    val out = operators.Urls.urlCanon(spark, dir).cache()
    assert(out.filter(col("canon_url").rlike("[A-Z]")).count() == 0)
    // scheme-DEFAULT ports are stripped; non-default combos (https:80,
    // http:443 — the synthesizer produces both) correctly survive
    assert(out.filter(col("canon_url").rlike("^https://[^/?]*:443")).count() == 0)
    assert(out.filter(col("canon_url").rlike("^http://[^/?]*:80(/|\\?|$)")).count() == 0)
    assert(out.filter(col("canon_url").rlike("utm_|fbclid|gclid|#")).count() == 0)
    // no duplicate slashes outside the scheme separator
    assert(out.filter(col("canon_url").rlike("[^:]//")).count() == 0)
    // the real param always survives
    assert(out.filter(!col("canon_url").contains("?id=") &&
      !col("canon_url").contains("&id=")).count() == 0)
    out.unpersist()
  }

  test("canonicalization is idempotent") {
    import spark.implicits._
    val once = operators.Urls.urlCanon(spark, dir)
      .select(col("p_partkey"), col("canon_url").as("url"))
    val twice = Urls.canonicalize(once)
      .select("p_partkey", "canon_url").as[(Long, String)].collect().toMap
    val first = operators.Urls.urlCanon(spark, dir)
      .select("p_partkey", "canon_url").as[(Long, String)].collect().toMap
    assert(twice == first)
  }
}
