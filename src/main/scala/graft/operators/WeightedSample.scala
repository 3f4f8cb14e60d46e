package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hashing, TopK}

/** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006) —
  * the missing rung of the sampling family: q38 stratifies uniformly,
  * q60/q64 take Bernoulli/rate-capped mixes (with-replacement-style
  * acceptance), but "give me exactly k docs per domain, longer docs
  * proportionally more likely, never the same doc twice" needs the
  * ES one-pass reservoir rule: key(i) = u_i^(1/w_i) with u_i uniform,
  * take the k LARGEST keys — provably equivalent to sequential
  * draw-without-replacement with probabilities ∝ w.
  *
  * Determinism (the q144/q150 discipline): u_i = (hash48("159:"+key)
  * + 1) / 2^48 — a pure function of the row key, so both engines
  * reproduce every draw bit-for-bit and re-runs are stable. The
  * monotone log form ln(u)/w replaces u^(1/w) (same ordering, no pow):
  * the ln output is snapped to the 1e-9 grid (engine ln ulp — the
  * q103 discipline) and the single division by the exact integer
  * weight is IEEE-identical cross-engine from identical operands.
  *
  * Plan/scale: one scan → per-row key (codegen'd md5 chain, no join)
  * → the [[graft.functions.TopK]] BOUNDED election per domain
  * (constant k-entry partial state, map-side combined — no per-domain
  * window, no sort; the s18 aggregate built for q151) → one
  * dimension-grade join back to fetch the elected rows' payload. The
  * DuckDB twin keeps the row_number formulation — the elected set is
  * identical.
  *
  * Weights must be > 0 (w ≤ 0 rows are excluded — a zero-weight item
  * has draw probability 0, and ES keys are undefined there). */
object WeightedSample {

  /** Per-domain sample size. */
  val K = 20
  /** Hash-family seed. */
  val Seed = 159

  /** Shared-text ES key over arbitrary weight/hash SQL operands:
    * snap9(ln((h+1)/2^48)) / w. */
  private[operators] def esKeySql(w: String, h: String): String =
    s"CAST(floor(ln((CAST($h AS DOUBLE) + 1.0) / 281474976710656.0)" +
      s" * 1e9 + 5e-1) AS DOUBLE) / 1e9 / CAST($w AS DOUBLE)"

  /** The key text over the keyed frame's (h, w) columns. */
  private val EsSql = esKeySql("w", "h")

  /** The (g, id, w, es) ES-keyed projection of a frame — a pure
    * per-row function (no shuffle); w ≤ 0 rows excluded. Stateless, so
    * it applies unchanged to a STREAMING frame (the 18x twin's front
    * end). */
  private[graft] def keyedEs(df: DataFrame, domainCol: String,
      keyCol: String, weightCol: String): DataFrame = df
    .filter(col(weightCol) > 0)
    .select(col(domainCol).as("g"), col(keyCol).cast("long").as("id"),
      col(weightCol).cast("long").as("w"))
    .withColumn("h", Hashing.hash48(Seed, col("id").cast("string")))
    .withColumn("es", expr(EsSql))

  /** Bounded per-domain election over a keyed frame → (g, id, rk),
    * rk 1..k by (es DESC, id) — constant k-entry partial state,
    * map-side combined (the s18 aggregate), no window. */
  private[operators] def elect(keyed: DataFrame, k: Int): DataFrame =
    keyed
      .groupBy(col("g"))
      .agg(TopK.topkIds(col("es"), col("id"), k).as("ids"))
      .select(col("g"), posexplode(col("ids")).as(Seq("p", "id")))
      .select(col("g"), col("id"), (col("p") + 1).as("rk"))

  /** ES sample of `k` rows per `domainCol`, weight ∝ `weightCol`
    * (positive integers), row identity = `keyCol` (BIGINT). Returns
    * (domain, key, w, rk, es_key) with rk 1..k by (es DESC, key). */
  def esSample(df: DataFrame, domainCol: String, keyCol: String,
      weightCol: String, k: Int = K): DataFrame = {
    // elected ids join back for payload + display key: checkpoint so
    // the scan + hash chain runs once (no CSE)
    val keyed = keyedEs(df, domainCol, keyCol, weightCol)
      .localCheckpoint(true)
    elect(keyed, k).join(keyed, Seq("g", "id"))
      .select(col("g").as(domainCol), col("id").as(keyCol), col("w"),
        col("rk").cast("int").as("rk"),
        (round(col("es"), 6) + 0.0).as("es_key"))
  }

  /** q160: k docs per source, draw probability ∝ document length —
    * the length-weighted shard sampler a token-budgeted training mix
    * wants (uniform doc sampling under-weights long documents' token
    * mass; weighting by n_chars samples ∝ content). */
  def sourceWeightedSample(spark: SparkSession, dir: String): DataFrame =
    esSample(Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars")),
      "source", "doc_id", "n_chars", K)

  /** DuckDB twin: identical hash, snap, key, election order. */
  val sourceWeightedSampleSql: String = {
    val h = Hashing.hash48Sql(Seed, "(doc_id)::VARCHAR")
    s"""WITH keyed AS (
       |  SELECT source, doc_id, w, $EsSql AS es
       |  FROM (SELECT source, doc_id, n_chars AS w, $h AS h
       |        FROM documents WHERE n_chars > 0)),
       |ranked AS (
       |  SELECT source, doc_id, w, es,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY es DESC, doc_id) AS rk
       |  FROM keyed)
       |SELECT source, doc_id, w, CAST(rk AS INT) AS rk,
       |  round(es, 6) + 0.0 AS es_key
       |FROM ranked WHERE rk <= $K""".stripMargin
  }
}
