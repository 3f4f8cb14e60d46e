package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** SQ8 scalar quantization — the int8 compression baseline of the ANN
  * deck (the "SQ" index family of Faiss; Johnson, Douze & Jégou,
  * "Billion-scale similarity search with GPUs", 2017, §3): each of the
  * d dimensions is quantized INDEPENDENTLY onto a uniform 256-level
  * grid between that dimension's corpus (min, max) — one byte per
  * dimension, an 8× memory cut vs float64 (4× vs float32) with NO
  * codebook training beyond two aggregates. The structural contrast
  * with PQ (q69): PQ spends its 8 bits per SUBSPACE on a learned
  * 256-centroid codebook (k-means fit, correlated dimensions), SQ
  * spends 8 bits per DIMENSION on a fixed uniform grid — cheaper to
  * fit and decode, weaker at equal rate; q347 measures that trade as
  * a recall number next to q241's IVF-PQ row.
  *
  * Search is ASYMMETRIC (the SDC/ADC distinction, Jégou et al. 2011):
  * the query stays exact, the corpus side is decoded back to
  * mn + code·span/255 — so the only approximation is corpus-side
  * rounding.
  *
  * Exactness / oracle parity: fit = plain min/max (no arithmetic);
  * encode = floor((x − mn)/span · 255) — single-rounded IEEE ops both
  * engines evaluate identically from identical doubles; decode =
  * mn + code·span/255, same text both sides; cosine = the house fused
  * fold ([[graft.functions.expressions.CosineSimilarity]] ≡ the
  * oracle's list_reduce). The WHOLE pipeline is therefore
  * full-hash-checkable — unlike the graph family, there is no
  * sequential construction anywhere.
  *
  * Plan/scale: fit is one posexplode + partial-aggregated groupBy
  * collapsing to d rows (collected under the codebook doctrine —
  * fixed d·2 doubles, never corpus-scaling); encode/decode is a pure
  * projection; search is the q24 broadcast-join shape over decoded
  * vectors. At 100 TB the decoded scan IS the point: the stored
  * corpus is d bytes/vector, decode happens on the fly inside the
  * scan projection, and the shuffle carries only k rows per query. */
object Sq {

  /** Per-dimension quantization grid: (mins, spans), span = max − min. */
  case class SqCodebook(mn: Array[Double], span: Array[Double]) {
    require(mn.length == span.length, "codebook arrays must align")
  }

  private def embCast(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Fit the per-dimension (min, span) grid: posexplode → groupBy(dim)
    * min/max — map-side partial aggregation collapses every partition
    * to ≤ d rows before the shuffle, so the fit costs one narrow pass
    * at any corpus size; the d-row result is collected under the
    * codebook doctrine (fixed d·2 doubles on the driver). */
  def fit(embeddings: DataFrame): SqCodebook = {
    val rows = embCast(embeddings)
      .select(posexplode(col("v")).as(Seq("j", "x")))
      .groupBy("j").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("j").collect()
    SqCodebook(
      rows.map(_.getDouble(1)),
      rows.map(r => r.getDouble(2) - r.getDouble(1)))
  }

  /** Decoded (reconstructed) vector column: per element j,
    * mn_j + floor((x − mn_j)/span_j · 255) · span_j / 255 — encode and
    * decode fused into one projection (the stored form would be the
    * byte codes; the arithmetic is identical). A zero-span dimension
    * (constant column) decodes to its constant. */
  def reconstruct(v: Column, cb: SqCodebook): Column = {
    val mnC = array(cb.mn.map(lit): _*)
    val spC = array(cb.span.map(lit): _*)
    transform(v, (x, i) => {
      val m = element_at(mnC, (i + lit(1)).cast("int"))
      val s = element_at(spC, (i + lit(1)).cast("int"))
      when(s === 0.0, m)
        .otherwise(m + floor((x - m) / s * lit(255.0)) * s / lit(255.0))
    })
  }

  /** q24's broadcast-join search shape over the DECODED corpus: exact
    * queries against SQ8-reconstructed vectors, per-query top-k. */
  def annSqQueries(corpus: DataFrame, queries: DataFrame, cb: SqCodebook,
      k: Int = Ann.TopK): DataFrame = {
    val rec = embCast(corpus)
      .select(col("vec_id"), reconstruct(col("v"), cb).as("rv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(Hnsw.queryFrame(queries))
      .join(rec, col("vec_id") =!= col("query_id"))
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("rv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos_sq"))
  }

  /** q346 — the registered fixture: stride queries through the
    * external-query path, codebook fit on the same corpus. */
  def annSq(embeddings: DataFrame): DataFrame =
    annSqQueries(embeddings, Hnsw.strideQueries(embeddings), fit(embeddings))

  def annSq(spark: SparkSession, dir: String): DataFrame =
    annSq(Tables.embeddings(spark, dir))

  /** DuckDB twin of [[annSq]]: the fit is a 2d-column aggregate CTE,
    * decode is the same per-dimension text unrolled, cosine is the
    * shared left fold — the whole SQ8 decision is hash-checked. */
  val annSqSql: String = {
    val d = Ann.Dim
    val fitCols = (1 to d).map(j =>
      s"min(v[$j]) AS mn$j, max(v[$j]) - min(v[$j]) AS sp$j").mkString(", ")
    val recElems = (1 to d).map(j =>
      s"CASE WHEN cb.sp$j = 0e0 THEN cb.mn$j ELSE cb.mn$j" +
        s" + floor((e.v[$j] - cb.mn$j) / cb.sp$j * 255e0)" +
        s" * cb.sp$j / 255e0 END").mkString(", ")
    val cos = s"(${VectorMath.dotSql("q.qv", "r.rv", d)} / (q.qnrm * r.nrm))"
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cb AS (SELECT $fitCols FROM emb),
       |rec AS (
       |  SELECT e.vec_id, list_value($recElems) AS rv
       |  FROM emb e, cb),
       |rec2 AS (SELECT vec_id, rv, ${VectorMath.normSql("rv", d)} AS nrm FROM rec),
       |q AS (SELECT vec_id AS query_id, v AS qv, ${VectorMath.normSql("v", d)} AS qnrm
       |      FROM emb WHERE vec_id % ${Ann.QueryStride} = 0),
       |scored AS (
       |  SELECT q.query_id, r.vec_id, $cos AS cos
       |  FROM q JOIN rec2 r ON r.vec_id <> q.query_id)
       |SELECT query_id, vec_id AS neighbor_id, rk, round(cos, 4) + 0.0 AS cos_sq FROM (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |WHERE rk <= ${Ann.TopK}""".stripMargin
  }

  /** q347 — SQ8 recall against brute-force truth (the q241/q313 audit
    * doctrine: a compression claim is a tuning slogan until recall is
    * a measured number), via the shared [[IvfPqRecall.recallAudit]]
    * scaffold so the compressed families read side by side. */
  def sqRecall(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.localCheckpoint(true) // both paths scan it
    val truth = Ann.annBrute(emb)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val returned = annSq(emb)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    IvfPqRecall.recallAudit(truth, returned)
  }

  def docSqRecall(spark: SparkSession, dir: String): DataFrame =
    sqRecall(Tables.embeddings(spark, dir))

  /** DuckDB twin: q24 and q346 verbatim as subqueries, then the shared
    * count arithmetic — full-hash like q241, unlike the graph audits. */
  val docSqRecallSql: String =
    IvfPqRecall.recallAuditSql(Ann.annBruteSql, annSqSql)
}
