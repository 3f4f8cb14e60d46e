package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** Product-quantization ANN (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") — the compressed-corpus scale path:
  * the corpus keeps M small codes per vector instead of the vector
  * (here 4 codes ≈ 4 B vs 64 doubles ≈ 512 B, a 128× storage cut), and
  * queries score candidates via per-subspace lookup tables (ADC —
  * asymmetric distance computation) instead of full-vector math.
  *
  * Fit: the 64-dim space splits into [[M]] 16-dim subspaces; each gets
  * a [[Ks]]-centroid codebook from Lloyd rounds with L2 assignment
  * (the reconstruction-error-minimizing metric) and the q45 fixed-point
  * mean (exact integer sums → round-6 centroids), so the DuckDB twin
  * re-derives the identical codebooks in CTEs. Encoding is a pure
  * projection against the codebook literals — no join, no shuffle.
  *
  * Query (ADC on cosine): dot(q, recon(x)) decomposes EXACTLY over
  * subspaces as Σ_m dot(q_m, c_{m,code_m}), and |recon(x)|² =
  * Σ_m |c_{m,code_m}|² — so per query the 10·[[M]]·[[Ks]]-row table of
  * (partial dot, centroid norm²) is all the float math there is; the
  * corpus side only joins 1-byte codes against it. The two Σ_m are
  * 4-term double sums whose order a shuffle could permute — they are
  * summed FIXED-POINT (round(x·1e9) as BIGINT, the q32/q45 technique)
  * so both engines produce identical cosines bit-for-bit, and the
  * final cos = (Σdot)/( |q| · √Σ|c|² ) runs as shared formula text.
  *
  * Query stage 2 (exact re-rank): ADC is a coarse sketch, so — as in
  * every production PQ deployment — the ADC ranking only builds a
  * per-query SHORTLIST of [[Rerank]] candidates; the final TopK comes
  * from exact cosine over the shortlist's true vectors. The expensive
  * full-vector math thus touches Rerank·queries rows, never the
  * corpus.
  *
  * Scale shape: fit = M dimension-grade jobs (k·subdim doubles to the
  * driver); encode = one projection; query = broadcast-join of the
  * (m, code)-keyed ADC table against the exploded code column + ONE
  * map-side-combined (query, doc) aggregate + per-query shortlist
  * window, then an equi-join of the tiny shortlist back to the vector
  * table for re-rank. Raw vectors are touched for Rerank rows per
  * query only — the point of PQ at 100 TB.
  */
object Pq {

  /** Subspaces (codes per vector). */
  val M = 4
  /** Dims per subspace. */
  val SubDim = Ann.Dim / M
  /** Codebook size per subspace (codes fit a byte at ≤256). */
  val Ks = 16
  /** Lloyd rounds per subspace codebook. */
  val FitIters = 1

  /** ADC shortlist size per query for the exact re-rank stage. */
  val Rerank = 50

  private def embCast(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Shared-association squared-L2 between an array column and a
    * centroid literal: ((x1−c1)·(x1−c1)) + … left-assoc, mirrored
    * textually by [[sqDistSql]]. */
  private def sqDist(v: Column, c: Seq[Double]): Column =
    (0 until SubDim).map { i =>
      val d = element_at(v, i + 1) - lit(c(i)); d * d
    }.reduce(_ + _)

  private def sqDistSql(a: String, b: String): String =
    (0 until SubDim).map { i =>
      s"(($a[${i + 1}] - $b[${i + 1}]) * ($a[${i + 1}] - $b[${i + 1}]))"
    }.mkString(" + ")

  /** Min-L2 code per subvector against codebook literals; ties break
    * toward the LOWER code (struct sort ascending ⇒ `d2 ASC, cell
    * ASC`, mirrored in the oracle). */
  private def assignCode(sub: Column, book: Seq[(Int, Seq[Double])]): Column =
    element_at(array_sort(array(book.map { case (cid, cv) =>
      struct(sqDist(sub, cv).as("d2"), lit(cid).as("cell"))
    }.toIndexedSeq: _*)), 1).getField("cell")

  /** Per-subspace codebooks: (m, code, centroid). Same deterministic
    * recipe as [[Kmeans.fit]] (first-Ks init by vec_id, fixed rounds,
    * fixed-point means) with L2 assignment on the m-th slice. */
  def fit(embeddings: DataFrame, iters: Int = FitIters): Seq[(Int, Int, Seq[Double])] = {
    val emb = embCast(embeddings).persist()
    val books = (0 until M).flatMap { m =>
      val sub = emb.select(col("vec_id"),
        slice(col("v"), m * SubDim + 1, SubDim).as("sv"))
      var book: Seq[(Int, Seq[Double])] =
        sub.orderBy(col("vec_id")).limit(Ks).collect()
          .toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
      for (_ <- 0 until iters) {
        val meanCols = (0 until SubDim).map(i =>
          round(sum(round(element_at(col("sv"), i + 1) * 1e9).cast("long"))
            .cast("double") / 1e9 / count(lit(1)), 6).as(s"d$i"))
        val upd = sub.withColumn("code", assignCode(col("sv"), book))
          .groupBy(col("code"))
          .agg(meanCols.head, meanCols.tail: _*)
          .collect()
          .map(r => r.getInt(0) -> (0 until SubDim).map(i => r.getDouble(i + 1)))
          .toMap
        book = book.map { case (cid, prev) => (cid, upd.getOrElse(cid, prev)) }
      }
      book.map { case (cid, cv) => (m, cid, cv) }
    }
    emb.unpersist()
    books
  }

  /** PQ-encode: (vec_id, m, code) long form — a pure projection. */
  def encode(embeddings: DataFrame, books: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val emb = embCast(embeddings)
    val codeCols = (0 until M).map { m =>
      val book = books.collect { case (`m`, cid, cv) => (cid, cv) }
      struct(lit(m).as("m"),
        assignCode(slice(col("v"), m * SubDim + 1, SubDim), book).as("code"))
    }
    emb.select(col("vec_id"), explode(array(codeCols: _*)).as("mc"))
      .select(col("vec_id"), col("mc.m").as("m"), col("mc.code").as("code"))
  }

  /** q69: ADC cosine top-k for the standard query set (every
    * [[Ann.QueryStride]]-th vector) over the PQ-encoded corpus. */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val embeddings = Tables.embeddings(spark, dir)
    val books = fit(embeddings)
    val emb = embCast(embeddings)
    val codes = encode(embeddings, books)
    import spark.implicits._
    val bookDf = books.toDF("m", "code", "cv")
    val queries = emb.filter(col("vec_id") % Ann.QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        VectorMath.norm(col("v")).as("qnrm"))
    val qSub = queries.select(col("query_id"), col("qnrm"),
        explode(array((0 until M).map(m =>
          struct(lit(m).as("m"),
            slice(col("qv"), m * SubDim + 1, SubDim).as("qm"))): _*)).as("s"))
      .select(col("query_id"), col("qnrm"),
        col("s.m").as("m"), col("s.qm").as("qm"))
    val adc = qSub.join(bookDf, "m")
      .select(col("query_id"), col("qnrm"), col("m"), col("code"),
        VectorMath.dot(col("qm"), col("cv")).as("pdot"),
        VectorMath.dot(col("cv"), col("cv")).as("cn2"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("vec_id"))
    val shortlist = codes.join(broadcast(adc), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("qnrm")).as("qnrm"),
        sum(round(col("pdot") * 1e9).cast("long")).as("numf"),
        sum(round(col("cn2") * 1e9).cast("long")).as("n2f"))
      .withColumn("adc_cos",
        expr("(numf / 1.0E9) / (qnrm * sqrt(n2f / 1.0E9))"))
      .withColumn("rk", row_number().over(wAdc))
      .filter(col("rk") <= Rerank)
      .select(col("query_id"), col("vec_id"))
    val wFin = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(emb, "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"))), "query_id")
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(wFin))
      .filter(col("rk") <= Ann.TopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** DuckDB twin: per-subspace fit CTEs (identical init, L2 tie order,
    * fixed-point means), code assignment, ADC table, fixed-point Σ_m,
    * shared cosine text. */
  val annPqSql: String = {
    def lo(m: Int) = m * SubDim + 1
    def hi(m: Int) = (m + 1) * SubDim
    val subFit = (0 until M).map { m =>
      s"""sub$m AS (SELECT vec_id, v[${lo(m)}:${hi(m)}] AS sv FROM emb),
         |cent0_$m AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, sv AS cv
         |  FROM (SELECT * FROM sub$m ORDER BY vec_id LIMIT $Ks)),
         |asg1_$m AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT s.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${sqDistSql("s.sv", "c.cv")} ASC, c.cell ASC) AS rk
         |    FROM sub$m s CROSS JOIN cent0_$m c)
         |  WHERE rk = 1),
         |upd_$m AS (
         |  SELECT cell, pos, round((sum(fix) / 1.0E9) / count(*), 6) AS a
         |  FROM (SELECT a.cell, generate_subscripts(s.sv, 1) AS pos,
         |               CAST(round(unnest(s.sv) * 1.0E9) AS BIGINT) AS fix
         |        FROM asg1_$m a JOIN sub$m s USING (vec_id))
         |  GROUP BY 1, 2),
         |cent1_$m AS (
         |  SELECT p.cell, coalesce(u.vlist, p.cv) AS cv FROM cent0_$m p
         |  LEFT JOIN (SELECT cell, list(a ORDER BY pos) AS vlist
         |             FROM upd_$m GROUP BY cell) u ON u.cell = p.cell),
         |codes_$m AS (
         |  SELECT vec_id, cell AS code FROM (
         |    SELECT s.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${sqDistSql("s.sv", "c.cv")} ASC, c.cell ASC) AS rk
         |    FROM sub$m s CROSS JOIN cent1_$m c)
         |  WHERE rk = 1),
         |adc_$m AS (
         |  SELECT q.query_id, c.cell AS code,
         |    ${VectorMath.dotSql(s"(q.qv[${lo(m)}:${hi(m)}])", "c.cv", SubDim)} AS pdot,
         |    ${VectorMath.dotSql("c.cv", "c.cv", SubDim)} AS cn2
         |  FROM q CROSS JOIN cent1_$m c)"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n")
    val codesUnion = (0 until M)
      .map(m => s"SELECT vec_id, $m AS m, code FROM codes_$m")
      .mkString(" UNION ALL ")
    val adcUnion = (0 until M)
      .map(m => s"SELECT query_id, $m AS m, code, pdot, cn2 FROM adc_$m")
      .mkString(" UNION ALL ")
    val exactCos = s"(${VectorMath.dotSql("q.qv", "e.v", Ann.Dim)} / (q.qnrm * e.nrm))"
    s"""WITH emb AS (
       |  SELECT vec_id, v, ${VectorMath.normSql("v", Ann.Dim)} AS nrm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
       |  FROM emb WHERE vec_id % ${Ann.QueryStride} = 0),
       |$subFit,
       |codes AS ($codesUnion),
       |adc AS ($adcUnion),
       |scored AS (
       |  SELECT a.query_id, c.vec_id,
       |    CAST(sum(CAST(round(a.pdot * 1.0E9) AS BIGINT)) AS BIGINT) AS numf,
       |    CAST(sum(CAST(round(a.cn2 * 1.0E9) AS BIGINT)) AS BIGINT) AS n2f
       |  FROM codes c JOIN adc a ON a.m = c.m AND a.code = c.code
       |  WHERE c.vec_id <> a.query_id
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT s.query_id, s.vec_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY (s.numf / 1.0E9) / (q.qnrm * sqrt(s.n2f / 1.0E9)) DESC,
       |                 s.vec_id) AS rk
       |    FROM scored s JOIN q ON q.query_id = s.query_id)
       |  WHERE rk <= $Rerank)
       |SELECT query_id, vec_id AS neighbor_id, rk, round(cos, 4) + 0.0 AS cos FROM (
       |  SELECT sh.query_id, sh.vec_id, $exactCos AS cos,
       |    row_number() OVER (PARTITION BY sh.query_id
       |      ORDER BY $exactCos DESC, sh.vec_id) AS rk
       |  FROM short sh JOIN emb e ON e.vec_id = sh.vec_id
       |               JOIN q ON q.query_id = sh.query_id)
       |WHERE rk <= ${Ann.TopK}""".stripMargin
  }
}
