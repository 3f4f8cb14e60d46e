package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Encoding-artifact (mojibake) detection — the text-quality gate a
  * web-scale ingest pipeline runs BEFORE language ID and quality
  * scoring, because the classic double-encode corruptions inflate
  * token counts, poison n-gram models, and survive every downstream
  * filter that assumes clean UTF-8. The four signatures cover the
  * dominant real-world modes:
  *
  *   - `Ã©`-class digraphs: UTF-8 bytes (0xC3 0xA9 …) decoded as
  *     Latin-1 — the single most common scrape corruption;
  *   - `â€™`-class trigraphs: Windows-1252 smart punctuation round-
  *     tripped through the same mistake;
  *   - `ï»¿`: a UTF-8 BOM decoded as Latin-1 and left inline;
  *   - U+FFFD `�`: the replacement character a lossy decode leaves.
  *
  * Counting is REPLACE-DIFF, not regex: hits(a) = (len(t) −
  * len(replace(t, a, ''))) / len(a) — plain string ops with identical
  * semantics in both engines, so the whole detector avoids regex
  * dialect risk entirely (every artifact is a fixed literal, and all
  * four are BMP so char counts agree).
  *
  * The REGISTERED query plants corruption first (the q238/q255
  * fixture doctrine — the synthetic corpus is clean, so the audited
  * payloads must carry known artifacts): a deterministic shared-text
  * transform seeds a doc_id-graded artifact load (0–3 digraph/quote
  * pairs, a BOM every 5th doc, a replacement char every 7th), and the
  * detector's counts — exact small integers per row — sit under the
  * FULL-HASH gate. Production points [[mojibakeScore]] at the raw
  * corpus and drops/repairs on `is_clean = 0`.
  *
  * Plan/scale: one projection over one scan — no joins, no shuffles,
  * no regex; per-row cost is a handful of substring scans. */
object Mojibake {

  /** (name, literal, char length) — fixed BMP literals, shared text. */
  val Artifacts: Seq[(String, String, Int)] = Seq(
    ("utf8_digraph", "Ã©", 2),
    ("smart_quote", "â€™", 3),
    ("bom", "ï»¿", 3),
    ("replacement", "�", 1))

  private def hitSql(t: String, art: String, n: Int): String =
    s"CAST((length($t) - length(replace($t, '$art', ''))) / $n AS BIGINT)"

  /** Detector over (doc_id, text): per-doc artifact counts, the
    * corrupt-character ratio, and the keep flag. */
  def mojibakeScore(docs: DataFrame): DataFrame = {
    val hitCols = Artifacts.map { case (nm, a, n) =>
      s"${hitSql("text", a, n)} AS n_$nm"
    }
    val weighted = Artifacts.map { case (nm, _, n) => s"n_$nm * $n" }
      .mkString(" + ")
    val names = Artifacts.map { case (nm, _, _) => s"n_$nm" }
    docs
      .selectExpr(Seq("doc_id", "text") ++ hitCols: _*)
      .selectExpr(Seq("doc_id") ++ names ++ Seq(
        s"round(CAST($weighted AS DOUBLE)" +
          " / CAST(greatest(length(text), 1) AS DOUBLE), 6) + 0.0" +
          " AS mojibake_ratio",
        s"CAST(CASE WHEN ${names.mkString(" + ")} = 0" +
          " THEN 1 ELSE 0 END AS INT) AS is_clean"): _*)
  }

  /** The deterministic corruption plant (shared text verbatim in the
    * oracle): doc_id-graded so every count level 0–3 appears. */
  val PlantSql: String =
    "CASE WHEN doc_id % 5 = 0 THEN 'ï»¿' ELSE '' END || text || ' ' ||" +
      " repeat('Ã© â€™ ', CAST(doc_id % 4 AS INT)) ||" +
      " CASE WHEN doc_id % 7 = 0 THEN '�' ELSE '' END"

  /** q268: plant, then detect — the detector under the hash gate. */
  def plantedMojibake(spark: SparkSession, dir: String): DataFrame =
    mojibakeScore(Tables.documents(spark, dir)
      .selectExpr("doc_id", s"$PlantSql AS text"))

  /** DuckDB twin: identical plant, identical replace-diff counts. */
  val plantedMojibakeSql: String = {
    // integer division: Spark `/` inside the CAST is exact here (the
    // length diff is an exact multiple of the artifact length); DuckDB
    // uses `//` to stay integer — same values either way
    val hitColsDuck = Artifacts.map { case (nm, a, n) =>
      s"CAST((length(text) - length(replace(text, '$a', ''))) // $n AS BIGINT) AS n_$nm"
    }
    val weighted = Artifacts.map { case (nm, _, n) => s"n_$nm * $n" }
      .mkString(" + ")
    val names = Artifacts.map { case (nm, _, _) => s"n_$nm" }
    s"""WITH planted AS (
       |  SELECT doc_id, $PlantSql AS text FROM documents),
       |hits AS (
       |  SELECT doc_id, text, ${hitColsDuck.mkString(", ")} FROM planted)
       |SELECT doc_id, ${names.mkString(", ")},
       |  round(CAST($weighted AS DOUBLE)
       |    / CAST(greatest(length(text), 1) AS DOUBLE), 6) + 0.0 AS mojibake_ratio,
       |  CAST(CASE WHEN ${names.mkString(" + ")} = 0 THEN 1 ELSE 0 END AS INT) AS is_clean
       |FROM hits""".stripMargin
  }
}
