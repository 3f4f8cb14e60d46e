package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Log-likelihood keyness — which terms are DISTINCTIVE of each
  * domain vs the rest of the corpus, by the corpus-linguistics G²
  * statistic (Dunning's log-likelihood ratio): for each (domain,
  * term), the 2×2 table (term/other-tokens × domain/rest) scored by
  * G² = 2·ΣO·ln(O/E). Complements q37's TF-IDF (a per-document
  * weighting) and q67's DSIR (a target-matching sampler) with the
  * corpus-comparison question: "what is this domain ABOUT, relative
  * to everything else".
  *
  * Exactness (the q104 ln discipline): all four cell counts derive
  * from exact integer (domain, term) counts; every ln argument is a
  * ratio of exact DECIMAL(38,0) products (O·N vs rowTot·colTot)
  * snapped to the 1e-9 grid; each O·ln term floors to integer
  * nano-nats and only integers sum — zero cells contribute 0 (the
  * 0·ln 0 convention). Ranking happens ON the exact integer
  * nano-nat score (ties by term), so top-k is deterministic in both
  * engines. Same 64-bit-floor precondition as q104 (total tokens
  * ≲ 2.5e10 per term; shrink the grid past that).
  *
  * Plan/scale: one tokenize-explode scan → (domain, term) counts;
  * term totals join back ON THE TERM KEY (vocabulary-grade — a
  * shuffle join at scale, broadcast when small; never a cross
  * product); domain totals and the grand total broadcast. The top-k
  * window partitions by domain over its own vocabulary. */
object Keyness {

  private def lnSnap(ratio: String): String =
    s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** One G² cell in integer nano-nats: o, rt, ct, n are exact-integer
    * column expressions (DECIMAL-safe); every substitution is
    * parenthesized — composite expressions otherwise rebind around
    * the multiplications. */
  private def cellNano(o: String, rt: String, ct: String): String =
    s"CASE WHEN ($o) > 0 THEN CAST(floor(CAST(($o) AS DOUBLE) * (${lnSnap(
      s"CAST(CAST(($o) AS DECIMAL(38,0)) * n AS DOUBLE)" +
        s" / CAST(CAST(($rt) AS DECIMAL(38,0)) * ($ct) AS DOUBLE)")}) * 1e9)" +
      " AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END"

  private val G2Nano: String = Seq(
    cellNano("a", "tt", "ng"),
    cellNano("tt - a", "tt", "n - ng"),
    cellNano("ng - a", "n - tt", "ng"),
    cellNano("n - ng - tt + a", "n - tt", "n - ng"))
    .mkString("(", " + ", ")")

  /** Top-`k` overused terms per domain by G² keyness. `docs` columns:
    * (domainCol, textCol whitespace-tokenizable). Returns (domain,
    * rank, term, tf_domain, tf_rest, g2). */
  def keyTerms(docs: DataFrame, domainCol: String, textCol: String,
      k: Int): DataFrame = {
    val cells = docs
      .filter(col(domainCol).isNotNull && col(textCol).isNotNull)
      .select(col(domainCol).as("g"),
        explode(split(col(textCol), " ")).as("t"))
      .filter("t <> ''")
      .groupBy("g", "t")
      .agg(expr("CAST(count(1) AS BIGINT)").as("a"))
      // vocabulary-grade and reused by three margins + the score join:
      // checkpoint so the corpus explode runs ONCE (q104's discipline;
      // no CSE across repeated frames)
      .localCheckpoint(true)
    val termTot = cells.groupBy("t")
      .agg(expr("CAST(sum(a) AS BIGINT)").as("tt"))
    val domTot = cells.groupBy("g")
      .agg(expr("CAST(sum(a) AS BIGINT)").as("ng"))
    val n = cells.agg(expr("CAST(sum(a) AS BIGINT)").as("n"))
    val scored = cells
      .join(termTot, "t")
      .join(broadcast(domTot), "g")
      .crossJoin(broadcast(n))
      // overused only: exact integer cross-multiplication, no shares
      .filter("CAST(a AS DECIMAL(38,0)) * n > CAST(tt AS DECIMAL(38,0)) * ng")
      .selectExpr("g", "t", "a", "tt - a AS b",
        s"CAST($G2Nano AS DECIMAL(38,0)) AS g2n")
    val w = Window.partitionBy("g").orderBy(col("g2n").desc, col("t"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .selectExpr("g", "rank", "t AS term",
        "a AS tf_domain", "b AS tf_rest",
        "round(2e0 * CAST(g2n AS DOUBLE) / 1e9, 4) + 0.0 AS g2")
  }

  val TopK = 5

  /** q121: the 5 most distinctive terms of each document source. */
  def sourceKeyTerms(spark: SparkSession, dir: String): DataFrame =
    Keyness.keyTerms(Tables.documents(spark, dir), "source", "text", TopK)
      .withColumnRenamed("g", "source")

  val sourceKeyTermsSql: String = {
    val g2 = G2Nano.replace("DECIMAL(38,0)", "HUGEINT")
    s"""WITH toks AS (
       |  SELECT source AS g, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |  WHERE source IS NOT NULL AND text IS NOT NULL),
       |cells AS (
       |  SELECT g, t, CAST(count(*) AS BIGINT) AS a
       |  FROM toks WHERE t <> '' GROUP BY 1, 2),
       |term_tot AS (SELECT t, CAST(sum(a) AS BIGINT) AS tt FROM cells GROUP BY 1),
       |dom_tot AS (SELECT g, CAST(sum(a) AS BIGINT) AS ng FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cells),
       |scored AS (
       |  SELECT g, t, a, tt - a AS b,
       |    CAST($g2 AS HUGEINT) AS g2n
       |  FROM cells JOIN term_tot USING (t) JOIN dom_tot USING (g)
       |    CROSS JOIN tot
       |  WHERE CAST(a AS HUGEINT) * n > CAST(tt AS HUGEINT) * ng),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY g
       |    ORDER BY g2n DESC, t) AS rank
       |  FROM scored)
       |SELECT g AS source, CAST(rank AS INT) AS rank, t AS term,
       |  a AS tf_domain, b AS tf_rest,
       |  round(2e0 * CAST(g2n AS DOUBLE) / 1e9, 4) + 0.0 AS g2
       |FROM ranked WHERE rank <= $TopK""".stripMargin
  }
}
