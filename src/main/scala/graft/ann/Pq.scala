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
  * projection against the codebook literals — no join, no shuffle —
  * to ONE row per vector carrying M small code columns (the compressed
  * layout you'd actually store).
  *
  * Query (ADC on cosine): dot(q, recon(x)) decomposes EXACTLY over
  * subspaces as Σ_m dot(q_m, c_{m,code_m}), and |recon(x)|² =
  * Σ_m |c_{m,code_m}|². Each query therefore carries M length-[[Ks]]
  * lookup ARRAYS (partial dots, built once per query), the centroid
  * norm² arrays are global literals, and scoring a pair is 2·M array
  * indexes + a shared-text formula — a pure projection on the
  * broadcast-joined (query × codes) pairs. No join fan-out on code
  * keys, no aggregate: the 4-term Σ_m runs in deterministic projection
  * order, textually mirrored in the oracle, so cosines are bit-exact
  * across engines.
  *
  * Query stage 2 (exact re-rank): ADC is a coarse sketch, so — as in
  * every production PQ deployment — the ADC ranking only builds a
  * per-query SHORTLIST of [[Rerank]] candidates; the final TopK comes
  * from exact cosine over the shortlist's true vectors. The expensive
  * full-vector math thus touches Rerank·queries rows, never the
  * corpus.
  *
  * Scale shape: fit = M dimension-grade jobs (k·subdim doubles to the
  * driver); encode = one projection; query = broadcast of
  * queries·(M·Ks + 1) doubles against the code table (the same
  * broadcast-pairs shape as [[Ann.annBrute]], at ~8 array lookups per
  * pair instead of a 64-dim dot), per-query shortlist window, then an
  * equi-join of the tiny shortlist back to the vector table for
  * re-rank. Raw vectors are touched for Rerank rows per query only —
  * the point of PQ at 100 TB.
  */
object Pq {

  /** Subspaces (codes per vector). */
  val M = 8
  /** Dims per subspace. */
  val SubDim = Ann.Dim / M
  /** Codebook size per subspace (codes fit a byte at ≤256). */
  val Ks = 16
  /** Lloyd rounds per subspace codebook (the default callers like
    * q145's residual fit inherit). */
  val FitIters = 1

  /** Lloyd rounds for the REGISTERED q69/q265 codebooks (r15: 1 → 3 —
    * the q145 lesson replayed on the PQ books themselves: the first-Ks
    * init plus a single round left sf0.1 recall at 0.455 even after
    * the ADC-128 shortlist; three rounds move the books off the init's
    * happenstance geometry). */
  val RegFitIters = 3

  /** ADC shortlist size per query for the exact re-rank stage
    * (r15: 50 → 128, q145's depth — the measured sf0.1 frontier in
    * BASELINE.md: ADC-50 read recall 0.455/0.435 (PQ/OPQ), ADC-128
    * buys back most of what 8-subspace quantization loses at 8k
    * vectors for ~1.6% of the corpus touched per query). */
  val Rerank = 128

  private def embCast(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Shared-association squared-L2 between an array column and a
    * centroid literal, as the fused native
    * [[graft.functions.expressions.SqDistance]] (one compiled loop, no
    * intermediate array — the HOF chain it replaces is CodegenFallback
    * and the encode projection evaluates this Ks·M = 128× per row; the
    * still-earlier unrolled 16-term variant had made Janino
    * compilation the dominant query cost). The fused left fold's
    * `0.0 + t1 + t2 + …` equals [[sqDistSql]]'s unrolled
    * `t1 + t2 + …` bitwise because every term is ≥ 0 and +0.0 is an
    * exact additive identity; native ≡ HOF parity is pinned by
    * DotProductSpec. */
  private[graft] def sqDist(v: Column, c: Seq[Double]): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.expressions.SqDistance(
        org.apache.spark.sql.GraftSql.expression(v),
        org.apache.spark.sql.GraftSql.expression(typedLit(c))))

  /** The composable HOF form [[sqDist]] fuses — kept for parity specs. */
  private[graft] def sqDistComposable(v: Column, c: Seq[Double]): Column =
    aggregate(zip_with(v, typedLit(c), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  private[ann] def sqDistSql(a: String, b: String): String =
    (0 until SubDim).map { i =>
      s"(($a[${i + 1}] - $b[${i + 1}]) * ($a[${i + 1}] - $b[${i + 1}]))"
    }.mkString(" + ")

  /** Min-L2 code per subvector against codebook literals; ties break
    * toward the LOWER code (struct sort ascending ⇒ `d2 ASC, cell
    * ASC`, mirrored in the oracle). */
  private[ann] def assignCode(sub: Column, book: Seq[(Int, Seq[Double])]): Column =
    element_at(array_sort(array(book.map { case (cid, cv) =>
      struct(sqDist(sub, cv).as("d2"), lit(cid).as("cell"))
    }.toIndexedSeq: _*)), 1).getField("cell")

  /** Per-subspace codebooks: (m, code, centroid). Same deterministic
    * recipe as [[Kmeans.fit]] (first-Ks init by vec_id, fixed rounds,
    * fixed-point means) with L2 assignment on the m-th slice.
    *
    * FUSED across subspaces (r15): the per-m loop ran 2·M Spark jobs
    * (init collect + update collect each) — pure job overhead at
    * M = 8. Now ONE init collect (the first Ks FULL vectors; every
    * subspace book is a driver-side slice of them) and ONE
    * posexplode-fused update aggregate per round (rows (m, code, sv),
    * one groupBy(m, code)). Bit-identical to the per-m loop — same
    * rows feed the same fixed-point integer sums, just keyed by
    * (m, code) instead of per-job — so the unchanged per-m oracle
    * text still matches exactly. */
  def fit(embeddings: DataFrame, iters: Int = FitIters): Seq[(Int, Int, Seq[Double])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val emb = embCast(embeddings)
    val head = emb.orderBy(col("vec_id")).limit(Ks).collect()
      .map(_.getSeq[Double](1))
    var books: IndexedSeq[IndexedSeq[(Int, Seq[Double])]] =
      (0 until M).map(m => head.zipWithIndex.map { case (v, i) =>
        (i, v.slice(m * SubDim, (m + 1) * SubDim))
      }.toIndexedSeq)
    // long (vec_id, m, sv) layout persisted across rounds; rounds ride
    // a BROADCAST codebook frame instead of baking centroid literals —
    // literals would Janino-compile a fresh whole-stage plan per round
    // (the Kmeans.fit r15 lesson). min(struct(d2, cell)) is the same
    // (d2 ASC, cell ASC) election as [[assignCode]]'s array_sort and
    // the oracle's row_number order; zip_with on two array COLUMNS is
    // the identical fold arithmetic as against a literal, so the
    // fitted books are bit-identical to the literal-projection path.
    val sub = emb.select(col("vec_id"), explode(array((0 until M).map { m =>
      struct(lit(m).as("m"), slice(col("v"), m * SubDim + 1, SubDim).as("sv"))
    }.toIndexedSeq: _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))
      .persist()
    val d2 = org.apache.spark.sql.GraftSql.column(
      graft.functions.expressions.SqDistance(
        org.apache.spark.sql.GraftSql.expression(col("sv")),
        org.apache.spark.sql.GraftSql.expression(col("cv"))))
    for (_ <- 0 until iters) {
      val bookDf = books.zipWithIndex.flatMap { case (bk, m) =>
        bk.map { case (cid, cv) => (m, cid, cv) }
      }.toDF("m", "cell", "cv")
      val meanCols = (0 until SubDim).map(i =>
        round(sum(round(element_at(col("sv"), i + 1) * 1e9).cast("long"))
          .cast("double") / 1e9 / count(lit(1)), 6).as(s"d$i"))
      val upd = sub.join(broadcast(bookDf), "m")
        .groupBy(col("vec_id"), col("m"))
        .agg(min(struct(d2.as("d2"), col("cell"))).getField("cell").as("code"),
          first(col("sv")).as("sv"))
        .groupBy(col("m"), col("code"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (0 until SubDim).map(i => r.getDouble(i + 2)))
        .toMap
      books = (0 until M).map(m => books(m).map { case (cid, prev) =>
        (cid, upd.getOrElse((m, cid), prev))
      })
    }
    sub.unpersist()
    (0 until M).flatMap(m => books(m).map { case (cid, cv) => (m, cid, cv) })
  }

  /** Ordered codebook for subspace m. */
  private[ann] def bookOf(books: Seq[(Int, Int, Seq[Double])], m: Int): Seq[(Int, Seq[Double])] =
    books.collect { case (`m`, cid, cv) => (cid, cv) }.sortBy(_._1)

  /** PQ-encode to the compressed layout: (vec_id, c0 … c{M−1}) — a
    * pure projection, one row per vector. */
  def encode(embeddings: DataFrame, books: Seq[(Int, Int, Seq[Double])]): DataFrame =
    embCast(embeddings).select(
      col("vec_id") +: (0 until M).map { m =>
        assignCode(slice(col("v"), m * SubDim + 1, SubDim), bookOf(books, m))
          .as(s"c$m")
      }: _*)

  /** q69: ADC cosine top-k (shortlist + exact re-rank) for the
    * standard query set over the PQ-encoded corpus. */
  def annPq(spark: SparkSession, dir: String): DataFrame =
    annPqFrame(Tables.embeddings(spark, dir))

  /** The whole q69 program over an arbitrary (vec_id, embedding)
    * frame — the reuse point for q265's rotated-space OPQ variant
    * (rotation is orthonormal, so the cosine program is unchanged in
    * the rotated coordinates). */
  def annPqFrame(embeddings: DataFrame): DataFrame = {
    val books = fit(embeddings, RegFitIters)
    val emb = embCast(embeddings)
    val codes = encode(embeddings, books)
    val queries = emb.filter(col("vec_id") % Ann.QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        VectorMath.norm(col("v")).as("qnrm"))
    // per-query partial-dot lookup arrays: t_m[code+1] = dot(q_m, c_{m,code}),
    // the same left-fold as the oracle's dotSql (HOF form — compact codegen)
    val qTab = queries.select(
      Seq(col("query_id"), col("qv"), col("qnrm")) ++ (0 until M).map { m =>
        array(bookOf(books, m).map { case (_, cv) =>
          VectorMath.dot(slice(col("qv"), m * SubDim + 1, SubDim), typedLit(cv))
        }: _*).as(s"t$m")
      }: _*)
    // centroid norm² lookup arrays are query-independent literals;
    // driver fold order matches the oracle's dotSql association
    val nLit = (0 until M).map { m =>
      typedLit(bookOf(books, m).map { case (_, cv) =>
        (0 until SubDim).map(i => cv(i) * cv(i)).reduceLeft(_ + _)
      })
    }
    val num = (0 until M).map(m =>
      element_at(col(s"t$m"), col(s"c$m") + 1)).reduce(_ + _)
    val n2 = (0 until M).map(m =>
      element_at(nLit(m), col(s"c$m") + 1)).reduce(_ + _)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("vec_id"))
    val shortlist = broadcast(qTab.drop("qv"))
      .join(codes, col("vec_id") =!= col("query_id"))
      .withColumn("adc_cos", num / (col("qnrm") * sqrt(n2)))
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
    * fixed-point means), wide code assignment, per-query lookup lists,
    * the identical 2·M-index scoring text, shortlist, exact re-rank. */
  val annPqSql: String = annPqSqlFrom(
    "", "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")

  /** [[annPqSql]] parameterized over the vector source (the q261
    * phWalkSql builder move): `pre` is extra leading CTE text (with
    * trailing comma) and `src` a subquery yielding (vec_id, v) —
    * q69's own text is the builder applied to the raw embeddings
    * source, byte-identical to the pre-refactor val. */
  def annPqSqlFrom(pre: String, src: String): String = {
    def lo(m: Int) = m * SubDim + 1
    def hi(m: Int) = (m + 1) * SubDim
    // [[RegFitIters]] Lloyd rounds per subspace: asg{r}/upd{r}/cent{r}
    // chains off cent{r-1}; cents are MATERIALIZED (each is referenced
    // by the next round AND by codes/tl/nl — DuckDB re-inlines plain
    // CTEs per reference, the q241 OOM lesson)
    val R = RegFitIters
    val subFit = (0 until M).map { m =>
      val rounds = (1 to R).map { r =>
        s"""asg${r}_$m AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT s.vec_id, c.cell,
           |      row_number() OVER (PARTITION BY s.vec_id
           |        ORDER BY ${sqDistSql("s.sv", "c.cv")} ASC, c.cell ASC) AS rk
           |    FROM sub$m s CROSS JOIN cent${r - 1}_$m c)
           |  WHERE rk = 1),
           |upd${r}_$m AS (
           |  SELECT cell, pos, round((sum(fix) / 1.0E9) / count(*), 6) AS a
           |  FROM (SELECT a.cell, generate_subscripts(s.sv, 1) AS pos,
           |               CAST(round(unnest(s.sv) * 1.0E9) AS BIGINT) AS fix
           |        FROM asg${r}_$m a JOIN sub$m s USING (vec_id))
           |  GROUP BY 1, 2),
           |cent${r}_$m AS MATERIALIZED (
           |  SELECT p.cell, coalesce(u.vlist, p.cv) AS cv FROM cent${r - 1}_$m p
           |  LEFT JOIN (SELECT cell, list(a ORDER BY pos) AS vlist
           |             FROM upd${r}_$m GROUP BY cell) u ON u.cell = p.cell)"""
          .stripMargin
      }.mkString(",\n")
      s"""sub$m AS MATERIALIZED (SELECT vec_id, v[${lo(m)}:${hi(m)}] AS sv FROM emb),
         |cent0_$m AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, sv AS cv
         |  FROM (SELECT * FROM sub$m ORDER BY vec_id LIMIT $Ks)),
         |$rounds,
         |codes_$m AS (
         |  SELECT vec_id, cell AS c$m FROM (
         |    SELECT s.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${sqDistSql("s.sv", "c.cv")} ASC, c.cell ASC) AS rk
         |    FROM sub$m s CROSS JOIN cent${R}_$m c)
         |  WHERE rk = 1),
         |tl_$m AS (
         |  SELECT query_id, list(pdot ORDER BY cell) AS t$m FROM (
         |    SELECT q.query_id, c.cell,
         |      ${VectorMath.dotSql(s"(q.qv[${lo(m)}:${hi(m)}])", "c.cv", SubDim)} AS pdot
         |    FROM q CROSS JOIN cent${R}_$m c)
         |  GROUP BY query_id),
         |nl_$m AS (
         |  SELECT list(cn2 ORDER BY cell) AS n$m FROM (
         |    SELECT cell, ${VectorMath.dotSql("cv", "cv", SubDim)} AS cn2
         |    FROM cent${R}_$m))"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n")
    val codesJoin = (1 until M)
      .map(m => s"JOIN codes_$m USING (vec_id)").mkString(" ", " ", "")
    val codesSel = (0 until M).map(m => s"c$m").mkString(", ")
    val qtabJoin = (0 until M).map(m => s"tl_$m").mkString(" JOIN ", " USING (query_id) JOIN ", " USING (query_id)")
    val numText = (0 until M).map(m => s"qt.t$m[c.c$m + 1]").mkString(" + ")
    val n2Text = (0 until M).map(m => s"nt.n$m[c.c$m + 1]").mkString(" + ")
    val ntabCross = (0 until M).map(m => s"nl_$m").mkString(" CROSS JOIN ")
    val exactCos = s"(${VectorMath.dotSql("q.qv", "e.v", Ann.Dim)} / (q.qnrm * e.nrm))"
    s"""WITH ${pre}emb AS (
       |  SELECT vec_id, v, ${VectorMath.normSql("v", Ann.Dim)} AS nrm
       |  FROM ($src)),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
       |  FROM emb WHERE vec_id % ${Ann.QueryStride} = 0),
       |$subFit,
       |codes AS (
       |  SELECT vec_id, $codesSel FROM codes_0$codesJoin),
       |qtab AS (SELECT * FROM q$qtabJoin),
       |ntab AS (SELECT * FROM $ntabCross),
       |scored AS (
       |  SELECT qt.query_id, qt.qnrm, c.vec_id,
       |    ($numText) / (qt.qnrm * sqrt($n2Text)) AS adc_cos
       |  FROM qtab qt CROSS JOIN ntab nt
       |  JOIN codes c ON c.vec_id <> qt.query_id),
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
