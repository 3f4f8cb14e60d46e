package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** IVFADC — the production ANN composition (Jégou et al. 2011, §IVFADC;
  * r10 verdict #6): an IVF coarse quantizer partitions the corpus into
  * cells ([[Ann.fitCentroids]]/[[Ann.annIvf]]), and each vector stores
  * PQ codes of its RESIDUAL v − c(cell) ([[Pq]] machinery on the
  * residual space). Queries probe their best `nProbe` cells and score
  * ONLY those cells' codes via ADC lookup tables — probing bounds the
  * candidate fraction (IVF's contribution) while codes shrink
  * per-candidate work to a few array indexes (PQ's contribution); the
  * residual encoding is why the composition beats either part alone:
  * residuals are small and centered, so the same Ks-code budget spends
  * its resolution inside the cell instead of across the whole space.
  *
  * ADC on cosine, exact decomposition over the coordinate-slice
  * subspaces (disjoint coordinates ⇒ cross-subspace dots vanish):
  *   dot(q, recon(x)) = dot(q, c_cell) + Σ_m t_m[code_m],
  *     t_m[j] = dot(q_m, cb_m[j])              (per query, M·Ks doubles)
  *   |recon(x)|² = |c_cell|² + 2·Σ_m cc_m[cell][code_m]
  *                 + Σ_m |cb_m[code_m]|²,
  *     cc_m[cell][j] = dot(c_cell,m, cb_m[j])  (per index, nCells·M·Ks)
  * All lookup arrays are driver-fitted literals (left folds in the
  * oracle's `dotSql` association, the q69 technique), so scoring a
  * (query, code-row) pair is `2·M+2` array indexes + one shared-text
  * formula — a pure projection on the cell-equi-joined pairs. As in
  * every production deployment the ADC ranking only builds a
  * [[Rerank]]-deep shortlist; exact cosine over true vectors ranks
  * the final top-k.
  *
  * Scale shape: fit = IVF's one k-bounded collect + PQ's M
  * dimension-grade jobs on the residual projection; encode = one
  * projection (vec_id, cell, M codes — the compressed layout you
  * store); query = broadcast of queries·(nProbe rows × (M·Ks + 2)
  * doubles) equi-joined on the cell id against the code table (probed
  * fraction ≈ nProbe/nCells of it), per-query shortlist window, then
  * the tiny shortlist joins back for exact re-rank. Raw vectors are
  * touched for Rerank rows per query only; everything else rides the
  * codes. Persistence via [[IndexStore]] (centroids + codebooks), so
  * query jobs load instead of re-fit.
  */
object IvfPq {

  /** A fitted IVFADC index: coarse centroids + residual codebooks. */
  case class Index(centroids: Seq[(Int, Seq[Double])],
      books: Seq[(Int, Int, Seq[Double])])

  /** ADC shortlist depth. Deeper than [[Pq.Rerank]] deliberately:
    * M coordinate-slice subspaces is still a COARSE code at M = 8
    * (production IVFADC runs up to M = 64), so on unstructured data
    * the ADC ordering needs a deeper exact re-rank to keep the recall
    * ≥ plain-IVF contract (IvfPqSpec) — size Rerank ≳ the expected
    * per-query candidate count where codes are this coarse, and
    * shrink it as M grows. */
  val Rerank = 128

  /** Lloyd rounds for the coarse quantizer ([[Kmeans.fit]]). The r14
    * q241 audit read recall 0.46 with the first-N-vectors stand-in
    * ([[Ann.fitCentroids]]) — the quantizer, not the code budget, was
    * the binding defect. Measured frontier at sf0.01 (M = 8,
    * rerank = 128): first-N/nProbe=4 0.46; lloyd2/nProbe=6 0.74;
    * lloyd2/nProbe=8 0.78; lloyd3/nProbe=8 0.80 (pure-IVF ceiling at
    * that probe width: 0.82). Each extra round is one
    * map-side-combined aggregate over the corpus — dimension-grade. */
  val CoarseIters = 3

  /** Probe width for the REGISTERED q145/q241 path. Wider than
    * [[Ann.IvfProbes]] = 4 because the recall audit is the product
    * here: 8/16 cells at test scale. At corpus scale nCells grows
    * ~√N and the probed FRACTION shrinks — keep nProbe/nCells on the
    * measured recall frontier above, not this literal ratio. */
  val Probes = 8

  private def embCast(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Per-row array of (cos-to-centroid, cell) structs sorted best
    * first — the [[Ann.annIvf]] assignment/probe expression, over any
    * vector column (corpus `v` or an external query's `qv`). */
  private def scoredCells(cents: Seq[(Int, Seq[Double])],
      vcol: Column = col("v")): Column =
    reverse(array_sort(array(cents.map { case (cid, cv) =>
      struct(VectorMath.cosineFast(vcol, typedLit(cv)).as("cos"),
        lit(cid).as("cell"))
    }.toIndexedSeq: _*)))

  /** Centroid vectors as one array-of-arrays literal, cell order. */
  private def centArr(cents: Seq[(Int, Seq[Double])]): Column =
    typedLit(cents.sortBy(_._1).map(_._2))

  /** (vec_id, cell, embedding = v − c_cell): the residual frame the
    * PQ codebooks fit and encode on. Pure projection — assignment via
    * centroid literals, subtraction via `zip_with` against the
    * cell-indexed literal array. */
  def residuals(embeddings: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame =
    embCast(embeddings)
      .withColumn("cell", element_at(scoredCells(cents), 1).getField("cell"))
      .withColumn("embedding",
        zip_with(col("v"), element_at(centArr(cents), col("cell") + 1),
          (a, b) => a - b))
      .select(col("vec_id"), col("cell"), col("embedding"))

  /** Fit the full index: Lloyd-fitted IVF centroids on the raw space
    * ([[Kmeans.fit]], [[CoarseIters]] rounds — see that constant for
    * the measured recall frontier vs the first-N stand-in), PQ
    * codebooks on the residual space (the [[Pq.fit]] recipe
    * unchanged — the residual frame carries the standard
    * (vec_id, embedding) shape). */
  def fit(embeddings: DataFrame, nCells: Int = Ann.IvfCells,
      iters: Int = Pq.FitIters): Index = {
    val cents = Kmeans.fit(embeddings, nCells, CoarseIters)
    Index(cents, Pq.fit(residuals(embeddings, cents), iters))
  }

  /** Encode to the compressed layout: (vec_id, cell, c0 … c{M−1}) —
    * one row per vector, a pure projection. */
  def encode(embeddings: DataFrame, idx: Index): DataFrame =
    residuals(embeddings, idx.centroids).select(
      col("vec_id") +: col("cell") +: (0 until Pq.M).map { m =>
        Pq.assignCode(
          slice(col("embedding"), m * Pq.SubDim + 1, Pq.SubDim),
          Pq.bookOf(idx.books, m)).as(s"c$m")
      }: _*)

  /** IVFADC against an EXTERNAL query frame (query_id, qv) — probe →
    * ADC shortlist → exact re-rank (r16 "missing #1"). */
  def annIvfAdcQueries(corpus: DataFrame, idx: Index, queries0: DataFrame,
      nProbe: Int = Probes, k: Int = Ann.TopK,
      rerank: Int = Rerank): DataFrame = {
    val cents = idx.centroids.sortBy(_._1)
    val emb = embCast(corpus)
    val codes = encode(corpus, idx)
    val qf = Hnsw.queryFrame(queries0)
    // per-(query, probed cell) rows carrying the query's lookup arrays
    // (t_m), its norm, and dot(q, c_cell) — nProbe rows per query
    val queries = qf
      .select(col("query_id"), col("qv"),
        VectorMath.norm(col("qv")).as("qnrm"),
        explode(transform(slice(scoredCells(cents, col("qv")), 1, nProbe),
          s => s.getField("cell"))).as("cell"))
    val qTab = queries.select(
      Seq(col("query_id"), col("qv"), col("qnrm"), col("cell"),
        VectorMath.dot(col("qv"),
          element_at(centArr(cents), col("cell") + 1)).as("qcdot")) ++
        (0 until Pq.M).map { m =>
          array(Pq.bookOf(idx.books, m).map { case (_, cv) =>
            VectorMath.dot(
              slice(col("qv"), m * Pq.SubDim + 1, Pq.SubDim), typedLit(cv))
          }: _*).as(s"t$m")
        }: _*)
    // index-side lookup literals, driver folds in dotSql association
    def dotD(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)
    def sliceM(v: Seq[Double], m: Int): Seq[Double] =
      v.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
    val cn2Lit = typedLit(cents.map { case (_, cv) => dotD(cv, cv) })
    val ccLit = (0 until Pq.M).map { m =>
      typedLit(cents.map { case (_, cv) =>
        Pq.bookOf(idx.books, m).map { case (_, bv) => dotD(sliceM(cv, m), bv) }
      })
    }
    val bn2Lit = (0 until Pq.M).map { m =>
      typedLit(Pq.bookOf(idx.books, m).map { case (_, bv) => dotD(bv, bv) })
    }
    // the shared-text ADC formula (association mirrored in the oracle)
    val num = (Seq(col("qcdot")) ++ (0 until Pq.M).map(m =>
      element_at(col(s"t$m"), col(s"c$m") + 1))).reduceLeft(_ + _)
    val ccSum = (0 until Pq.M).map(m =>
      element_at(element_at(ccLit(m), col("cell") + 1), col(s"c$m") + 1))
      .reduceLeft(_ + _)
    val bnSum = (0 until Pq.M).map(m =>
      element_at(bn2Lit(m), col(s"c$m") + 1)).reduceLeft(_ + _)
    val n2 = element_at(cn2Lit, col("cell") + 1) + lit(2.0) * ccSum + bnSum
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("vec_id"))
    val shortlist = broadcast(qTab.drop("qv"))
      .join(codes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_cos", num / (col("qnrm") * sqrt(n2)))
      .withColumn("rk", row_number().over(wAdc))
      .filter(col("rk") <= rerank)
      .select(col("query_id"), col("vec_id"))
    val wFin = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(emb, "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(wFin))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** IVFADC query over the registered stride fixture: probe → ADC
    * shortlist → exact re-rank. */
  def annIvfAdc(embeddings: DataFrame, idx: Index,
      nProbe: Int = Probes, k: Int = Ann.TopK,
      rerank: Int = Rerank): DataFrame =
    annIvfAdcQueries(embeddings, idx, Hnsw.strideQueries(embeddings),
      nProbe, k, rerank)

  /** Registered q145: explicit fit-then-query composition. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    annIvfAdc(emb, fit(emb))
  }

  /** DuckDB twin: re-derives the identical coarse centroids
    * ([[Ann.annIvfSql]] machinery), residuals (elementwise subtraction
    * via list_transform), per-subspace residual codebooks
    * ([[Pq.annPqSql]] machinery on `rv`), code assignment, per-query
    * and per-index lookup lists, the identical ADC scoring text,
    * shortlist, and exact re-rank — hash parity for the WHOLE IVFADC
    * decision chain, not an approximation of it. */
  val annIvfPqSql: String = {
    val Dim = Ann.Dim
    val SubDim = Pq.SubDim
    def lo(m: Int) = m * SubDim + 1
    def hi(m: Int) = (m + 1) * SubDim
    val ccos = s"(${VectorMath.dotSql("e.v", "c.v", Dim)} / (e.nrm * c.nrm))"
    // per-subspace residual fit + codes + query/index lookup lists —
    // the annPqSql subFit text with `rv` (residual) as the source and
    // the extra per-cell cc lists
    val subFit = (0 until Pq.M).map { m =>
      s"""sub$m AS MATERIALIZED (SELECT vec_id, rv[${lo(m)}:${hi(m)}] AS sv FROM resid),
         |cent0_$m AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, sv AS cv
         |  FROM (SELECT * FROM sub$m ORDER BY vec_id LIMIT ${Pq.Ks})),
         |asg1_$m AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT s.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${Pq.sqDistSql("s.sv", "c.cv")} ASC, c.cell ASC) AS rk
         |    FROM sub$m s CROSS JOIN cent0_$m c)
         |  WHERE rk = 1),
         |upd_$m AS (
         |  SELECT cell, pos, round((sum(fix) / 1.0E9) / count(*), 6) AS a
         |  FROM (SELECT a.cell, generate_subscripts(s.sv, 1) AS pos,
         |               CAST(round(unnest(s.sv) * 1.0E9) AS BIGINT) AS fix
         |        FROM asg1_$m a JOIN sub$m s USING (vec_id))
         |  GROUP BY 1, 2),
         |cent1_$m AS MATERIALIZED (
         |  SELECT p.cell, coalesce(u.vlist, p.cv) AS cv FROM cent0_$m p
         |  LEFT JOIN (SELECT cell, list(a ORDER BY pos) AS vlist
         |             FROM upd_$m GROUP BY cell) u ON u.cell = p.cell),
         |codes_$m AS MATERIALIZED (
         |  SELECT vec_id, cell AS c$m FROM (
         |    SELECT s.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${Pq.sqDistSql("s.sv", "c.cv")} ASC, c.cell ASC) AS rk
         |    FROM sub$m s CROSS JOIN cent1_$m c)
         |  WHERE rk = 1),
         |tl_$m AS (
         |  SELECT query_id, list(pdot ORDER BY cell) AS t$m FROM (
         |    SELECT q.query_id, c.cell,
         |      ${VectorMath.dotSql(s"(q.qv[${lo(m)}:${hi(m)}])", "c.cv", SubDim)} AS pdot
         |    FROM q CROSS JOIN cent1_$m c)
         |  GROUP BY query_id),
         |bnl_$m AS (
         |  SELECT list(bn2 ORDER BY cell) AS bn$m FROM (
         |    SELECT cell, ${VectorMath.dotSql("cv", "cv", SubDim)} AS bn2
         |    FROM cent1_$m)),
         |ccl_$m AS (
         |  SELECT cc.cell, list(ccd ORDER BY code) AS cc$m FROM (
         |    SELECT c.cell, b.cell AS code,
         |      ${VectorMath.dotSql(s"(c.v[${lo(m)}:${hi(m)}])", "b.cv", SubDim)} AS ccd
         |    FROM cent c CROSS JOIN cent1_$m b) cc
         |  GROUP BY cc.cell)"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n")
    val codesJoin = (1 until Pq.M)
      .map(m => s"JOIN codes_$m USING (vec_id)").mkString(" ", " ", "")
    val codesSel = (0 until Pq.M).map(m => s"c$m").mkString(", ")
    val qtabJoin = (0 until Pq.M).map(m => s"tl_$m")
      .mkString(" JOIN ", " USING (query_id) JOIN ", " USING (query_id)")
    val cclJoin = (1 until Pq.M)
      .map(m => s"JOIN ccl_$m USING (cell)").mkString(" ", " ", "")
    val bnlCross = (0 until Pq.M).map(m => s"bnl_$m").mkString(" CROSS JOIN ")
    val numText = "qt.qcdot + " +
      (0 until Pq.M).map(m => s"qt.t$m[c.c$m + 1]").mkString(" + ")
    val ccText = (0 until Pq.M).map(m => s"cl.cc$m[c.c$m + 1]").mkString(" + ")
    val bnText = (0 until Pq.M).map(m => s"bn.bn$m[c.c$m + 1]").mkString(" + ")
    val exactCos = s"(${VectorMath.dotSql("q.qv", "e.v", Dim)} / (q.qnrm * e.nrm))"
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, v, ${VectorMath.normSql("v", Dim)} AS nrm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
       |  FROM emb WHERE vec_id % ${Ann.QueryStride} = 0),
       |${Kmeans.coarseCtes(Ann.IvfCells, CoarseIters, "kc")},
       |cent AS MATERIALIZED (
       |  SELECT cell, v, ${VectorMath.normSql("v", Dim)} AS nrm
       |  FROM kccent$CoarseIters),
       |centn AS (SELECT cell, ${VectorMath.dotSql("v", "v", Dim)} AS cn2 FROM cent),
       |cellscore AS (
       |  SELECT e.vec_id, c.cell, $ccos AS ccos
       |  FROM emb e CROSS JOIN cent c),
       |ranked AS MATERIALIZED (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell DESC) AS crk
       |  FROM cellscore),
       |assigned AS (SELECT vec_id, cell FROM ranked WHERE crk = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cell FROM ranked
       |  WHERE vec_id % ${Ann.QueryStride} = 0 AND crk <= $Probes),
       |resid AS MATERIALIZED (
       |  SELECT e.vec_id, a.cell,
       |    list_transform(range(1, ${Dim + 1}), i -> e.v[i] - c.v[i]) AS rv
       |  FROM emb e JOIN assigned a USING (vec_id)
       |  JOIN cent c ON c.cell = a.cell),
       |$subFit,
       |codes AS MATERIALIZED (
       |  SELECT r.vec_id, r.cell, $codesSel
       |  FROM resid r JOIN codes_0 USING (vec_id)$codesJoin),
       |qp AS (
       |  SELECT p.query_id, p.cell, q.qnrm,
       |    ${VectorMath.dotSql("q.qv", "c.v", Dim)} AS qcdot
       |  FROM probes p JOIN q ON q.query_id = p.query_id
       |  JOIN cent c ON c.cell = p.cell),
       |qtab AS (SELECT * FROM qp$qtabJoin),
       |scored AS (
       |  SELECT qt.query_id, c.vec_id,
       |    ($numText)
       |    / (qt.qnrm * sqrt(cn.cn2 + 2.0 * ($ccText) + ($bnText))) AS adc_cos
       |  FROM qtab qt
       |  JOIN codes c ON c.cell = qt.cell AND c.vec_id <> qt.query_id
       |  JOIN centn cn ON cn.cell = qt.cell
       |  JOIN (SELECT cell AS ccell, ${(0 until Pq.M).map(m => s"cc$m").mkString(", ")}
       |        FROM ccl_0$cclJoin) cl
       |    ON cl.ccell = qt.cell
       |  CROSS JOIN (SELECT * FROM $bnlCross) bn),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_cos DESC, vec_id) AS rk
       |    FROM scored)
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
