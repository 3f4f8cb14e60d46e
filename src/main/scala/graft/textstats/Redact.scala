package graft.textstats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII redaction for training-data curation: scrub emails, US-style
  * phone numbers, and IPv4 addresses from document text, reporting
  * per-type match counts. Purely per-row projection — no shuffle at any
  * scale — and every regex sticks to the syntax subset that Java's
  * regex and RE2 (the DuckDB oracle's engine) interpret identically:
  * character classes, bounded repetition, \\d, \\b; no backrefs, no
  * lookaround.
  *
  * The testdata corpus contains no PII, so — like q6's dirty-name
  * construction (Relational.textClean) — the registered query first
  * INJECTS deterministic doc_id-derived PII into a subset of rows
  * (including none-injected and doubly-injected docs), then redacts;
  * the oracle builds the identical dirty text.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact all three PII classes from `text`, with match counts.
    * Emails first: once replaced, their digit runs can no longer
    * shadow-match the phone/IP patterns. */
  def redact(text: Column): (Column, Column, Column, Column) = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val afterPhone = regexp_replace(afterIp, PhoneRe, "<PHONE>")
    (afterPhone,
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).cast("long"),
      size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))).cast("long"))
  }

  /** Deterministic PII injection: ~1/3 of docs get an email (every 6th
    * doc a second one), ~1/5 a phone, ~1/7 an IPv4; plenty of rows get
    * nothing, some get several. */
  private def dirty(text: Column, id: Column): Column = {
    val email = when(id % 3 === 0,
      concat(lit(" contact user"), id.cast("string"), lit("@mail"),
        (id % 10).cast("string"), lit(".example.com"))).otherwise("")
    val email2 = when(id % 6 === 0,
      concat(lit(" cc admin"), id.cast("string"), lit("@corp.example.org")))
      .otherwise("")
    val phone = when(id % 5 === 0,
      concat(lit(" call "), (id % 900 + 100).cast("string"), lit("-555-"),
        lpad((id % 10000).cast("string"), 4, "0"))).otherwise("")
    val ip = when(id % 7 === 0,
      concat(lit(" from 10."), (id % 256).cast("string"), lit("."),
        (floor(id / 7).cast("long") % 256).cast("string"), lit("."),
        (id % 254 + 1).cast("string"))).otherwise("")
    concat(text, email, email2, phone, ip)
  }

  /** Registered q41: inject → redact → per-doc counts + cleaned text. */
  def piiRedact(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"),
      dirty(col("text"), col("doc_id")).as("dirty_text"))
    val (cleanText, nEmails, nIps, nPhones) = redact(col("dirty_text"))
    d.select(col("doc_id"), cleanText.as("clean_text"),
      nEmails.as("n_emails"), nPhones.as("n_phones"), nIps.as("n_ips"))
  }

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedact(Tables.documents(spark, dir))

  val piiRedactSql: String = {
    // RE2 via DuckDB; 'g' flag for replace-all to match Spark's
    // regexp_replace semantics. Patterns embed verbatim: single-quoted
    // SQL strings treat backslash literally.
    val email = EmailRe
    s"""WITH dirty AS (
       |  SELECT doc_id,
       |    text
       |    || CASE WHEN doc_id % 3 = 0
       |         THEN ' contact user' || doc_id || '@mail' || (doc_id % 10) || '.example.com'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 6 = 0
       |         THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0
       |         THEN ' call ' || (doc_id % 900 + 100) || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0
       |         THEN ' from 10.' || (doc_id % 256) || '.' || ((doc_id // 7) % 256) || '.' || (doc_id % 254 + 1)
       |         ELSE '' END AS dirty_text
       |  FROM documents),
       |step AS (
       |  SELECT doc_id, dirty_text,
       |    regexp_replace(dirty_text, '$email', '<EMAIL>', 'g') AS after_email
       |  FROM dirty),
       |step2 AS (
       |  SELECT doc_id, dirty_text, after_email,
       |    regexp_replace(after_email, '$Ipv4Re', '<IP>', 'g') AS after_ip
       |  FROM step)
       |SELECT doc_id,
       |  regexp_replace(after_ip, '$PhoneRe', '<PHONE>', 'g') AS clean_text,
       |  len(regexp_extract_all(dirty_text, '$email')) AS n_emails,
       |  len(regexp_extract_all(after_ip, '$PhoneRe')) AS n_phones,
       |  len(regexp_extract_all(after_email, '$Ipv4Re')) AS n_ips
       |FROM step2""".stripMargin
  }
}
