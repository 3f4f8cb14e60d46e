package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Reciprocal-rank fusion (RRF, Cormack et al. 2009) — merge two
  * rankings of the same corpus into one consensus ranking by summing
  * 1/(k + rank) per list. The standard hybrid-retrieval / ensemble
  * move: scores from different scorers are not commensurable (q61's
  * hashed-feature sum lives on a different scale from q74's
  * transition-probability mean), but RANKS are, and RRF's k = 60
  * damping keeps one list's head from drowning the other. Registered
  * as the curation ensemble: fuse the quality (q61) and fluency (q74)
  * rankings into the consensus top slice — the "keep what BOTH
  * filters like" shortlist a multi-scorer pipeline actually cuts on.
  *
  * Determinism/exactness: both input scores are exact BIGINTs; ranks
  * are COMPETITION (min) ranks — ties share the rank of their first
  * member — computed from distinct-score cells (cumulative
  * strictly-greater count + 1), a pure function of the score
  * multiset, so within-tie order never matters and both engines agree
  * exactly. Contributions are floored micro-units
  * 10⁶ div (60 + rank); the fused election orders by
  * (rrf_micro DESC, doc_id) — a total order.
  *
  * Plan/scale: each ranking is ONE map-side-combined cell aggregate +
  * a cumulative window over the DISTINCT-SCORE cell frame (the
  * q83-class value window, bounded by the quantized score grid) + one
  * equi-join back on the score value (key occupancy = tie count — no
  * hot keys). The final top-k is a TakeOrderedAndProject (bounded
  * per-partition heaps, no global sort, no window). */
object RankFusion {

  /** RRF damping constant (the published default). */
  val K = 60L
  /** Registered consensus-slice size. */
  val TopN = 20

  /** Attach the competition rank of `valueCol` (descending) as
    * `rankName`, via distinct-value cells. */
  private def minRank(scores: DataFrame, valueCol: String,
      rankName: String): DataFrame = {
    val cells = scores.groupBy(col(valueCol).as("s")).agg(count(lit(1)).as("nt"))
    val w = Window.orderBy(col("s").desc).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn(rankName, coalesce(sum(col("nt")).over(w), lit(0L)) + lit(1L))
      .select(col("s").as(valueCol), col(rankName))
    scores.join(ranked, valueCol)
  }

  /** RRF over two exact-integer score columns on a shared frame:
    * ranks each descending, fuses, returns the top `n` by fused
    * score. Output: (doc_id, rank_a, rank_b, rrf_micro). */
  def fuse(scored: DataFrame, scoreA: String, scoreB: String,
      n: Int = TopN): DataFrame =
    minRank(minRank(scored, scoreA, "rank_a"), scoreB, "rank_b")
      .selectExpr("doc_id", "rank_a", "rank_b",
        s"1000000 div ($K + rank_a) + 1000000 div ($K + rank_b) AS rrf_micro")
      .orderBy(desc("rrf_micro"), col("doc_id"))
      .limit(n)

  /** q172: consensus top-20 documents under the q61 quality and q74
    * fluency rankings (docs with ≥ 2 tokens — the fluency scope). */
  def qualityFluencyConsensus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val q = QualityModel.qualityScore(docs).select(col("doc_id"), col("score_sum"))
    val f = Fluency.fluencyScore(docs).select(col("doc_id"), col("fluency"))
    fuse(q.join(f, "doc_id"), "score_sum", "fluency")
      .selectExpr("doc_id", "rank_a AS rank_quality", "rank_b AS rank_fluency",
        "rrf_micro")
  }

  /** DuckDB twin: the q61 and q74 score chains verbatim, competition
    * ranks via rank() (≡ the cell formulation), identical fusion. */
  val qualityFluencyConsensusSql: String = {
    val hash = Hashing.hash48Sql("tok")
    val weight = Hashing.hash48Sql(
      s"'${QualityModel.FeatureSeed}:' || ($hash % ${QualityModel.Buckets})::VARCHAR")
    s"""WITH qtoks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |qscore AS (
       |  SELECT doc_id, CAST(sum($weight % 1001 - 500) AS BIGINT) AS score_sum
       |  FROM qtoks GROUP BY 1),
       |ftoks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |bi AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(l)),
       |      i -> {'w1': l[i], 'w12': l[i] || ' ' || l[i + 1]})) AS p
       |  FROM ftoks WHERE len(l) >= 2),
       |bib AS (
       |  SELECT doc_id,
       |    ${Hashing.hash48Sql("p.w1")} % ${Fluency.B} AS b1,
       |    ${Hashing.hash48Sql("p.w12")} % ${Fluency.B} AS b12
       |  FROM bi),
       |c1 AS (SELECT b1, CAST(count(*) AS BIGINT) AS c1 FROM bib GROUP BY 1),
       |c12 AS (SELECT b12, CAST(count(*) AS BIGINT) AS c12 FROM bib GROUP BY 1),
       |fscore AS (
       |  SELECT doc_id,
       |    CAST(sum(((c12.c12 + 1) * ${Fluency.PScale}) // (c1.c1 + ${Fluency.B})) AS BIGINT)
       |      // count(*) AS fluency
       |  FROM bib JOIN c1 USING (b1) JOIN c12 USING (b12)
       |  GROUP BY 1),
       |uni AS (
       |  SELECT q.doc_id, q.score_sum, f.fluency
       |  FROM qscore q JOIN fscore f ON f.doc_id = q.doc_id),
       |ranked AS (
       |  SELECT doc_id,
       |    CAST(rank() OVER (ORDER BY score_sum DESC) AS BIGINT) AS rank_quality,
       |    CAST(rank() OVER (ORDER BY fluency DESC) AS BIGINT) AS rank_fluency
       |  FROM uni),
       |fused AS (
       |  SELECT doc_id, rank_quality, rank_fluency,
       |    1000000 // ($K + rank_quality) + 1000000 // ($K + rank_fluency)
       |      AS rrf_micro
       |  FROM ranked)
       |SELECT doc_id, rank_quality, rank_fluency, rrf_micro
       |FROM fused
       |ORDER BY rrf_micro DESC, doc_id
       |LIMIT $TopN""".stripMargin
  }
}
