package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hyperplanes, VectorMath}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2 #24–25), plus the embedding near-duplicate operator
  * (#23) that shares the sign-LSH machinery.
  *
  * All vector math is `zip_with`/`aggregate` over array<double> —
  * codegen'd, no UDFs — with a strict left-fold so doubles are
  * bitwise-identical to the DuckDB oracle ([[graft.functions.VectorMath]]).
  */
object Ann {

  val Dim = 64
  val TopK = 5
  /** Every 50th vector is a query point (10 queries at sf0.01). */
  val QueryStride = 50

  /** Vectors as array<double>. Scoring uses the fused native
    * [[graft.functions.expressions.CosineSimilarity]] — one register-
    * allocated pass per pair, no intermediate arrays, bitwise-identical
    * to the composable fold the oracle uses. */
  private def embCast(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** DuckDB twin of [[embCast]] as a CTE body. */
  private val embCteSql: String =
    s"""SELECT vec_id, v, ${VectorMath.normSql("v", Dim)} AS nrm
       |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""".stripMargin

  // ---- #24 brute-force cosine top-k ----

  /** Exact cosine top-k of an EXTERNAL query frame — (query_id, qv) —
    * against the corpus (r16 "missing #1": find neighbors of MY
    * vectors): broadcast the (small) query set against the full corpus
    * scan, window-rank per query. The corpus side is a single pruned
    * scan — at 100 TB the broadcast side stays tiny so this is
    * shuffle-free until the final per-query top-k (TopK rows per query
    * via rank). This is the recall oracle for [[annLsh]]; the scale
    * path is LSH. A corpus row whose vec_id equals a query's query_id
    * is excluded as a self-pair. */
  def annBruteQueries(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val emb = embCast(corpus)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(Hnsw.queryFrame(queries))
      .join(emb, col("vec_id") =!= col("query_id"))
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** q24 — the registered fixture: [[Hnsw.strideQueries]] through the
    * external-query path. */
  def annBrute(embeddings: DataFrame): DataFrame =
    annBruteQueries(embeddings, Hnsw.strideQueries(embeddings))

  def annBrute(spark: SparkSession, dir: String): DataFrame =
    annBrute(Tables.embeddings(spark, dir))

  val annBruteSql: String = {
    val cos = s"(${VectorMath.dotSql("q.qv", "e.v", Dim)} / (q.qnrm * e.nrm))"
    s"""WITH emb AS (${embCteSql.replace("\n", " ")}),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM emb WHERE vec_id % $QueryStride = 0),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, $cos AS cos
       |  FROM q JOIN emb e ON e.vec_id <> q.query_id)
       |SELECT query_id, vec_id AS neighbor_id, rk, round(cos, 4) + 0.0 AS cos FROM (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |WHERE rk <= $TopK""".stripMargin
  }

  // ---- #25 LSH-bucketed ANN (scale path; rows-only oracle) ----

  val LshPlanes = 4
  val LshTables = 3

  /** Sign-LSH ANN: `LshTables` independent 4-plane tables; candidates =
    * vectors sharing a bucket with the query in ANY table; exact cosine
    * rank within candidates. Per table the shuffle key is the bucket id,
    * so candidate generation is a hash join on a small key — O(n·tables)
    * — never a cross join. Recall vs [[annBrute]] is asserted in
    * AnnSpec; the pipeline itself is fully deterministic (md5-derived
    * planes), so [[annLshSql]] reproduces the exact bucket decision and
    * the oracle hash-matches — it verifies THIS plan, not brute force. */
  def annLshQueries(corpus: DataFrame, queries0: DataFrame,
      dim: Int = Dim): DataFrame = {
    val emb = embCast(corpus)
    // plane index offset per table gives independent hash families
    val withBuckets = (0 until LshTables).foldLeft(emb) { (df, t) =>
      df.withColumn(s"b$t",
        Hyperplanes.bucket(col("v"), LshPlanes, dim, planeOffset = t * LshPlanes))
    }
    val tables = (0 until LshTables).map { t =>
      withBuckets.select(col("vec_id"), col("v"),
        lit(t).as("tbl"), col(s"b$t").as("bucket"))
    }.reduce(_ unionByName _)
    // the query side buckets its OWN vectors with the same plane
    // families — an external query needs no corpus row to hash
    val qBuck = (0 until LshTables).foldLeft(Hnsw.queryFrame(queries0)) {
      (df, t) =>
        df.withColumn(s"b$t",
          Hyperplanes.bucket(col("qv"), LshPlanes, dim, planeOffset = t * LshPlanes))
    }
    val queries = (0 until LshTables).map { t =>
      qBuck.select(col("query_id"), col("qv"),
        lit(t).as("tbl"), col(s"b$t").as("bucket"))
    }.reduce(_ unionByName _)
    // dedupe multi-table repeats on the scalar pair key — a distinct
    // over rows still carrying both 64-double vectors would shuffle and
    // compare ~1 KB per candidate instead of 16 bytes
    val cands = broadcast(queries)
      .join(tables, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(first(col("qv")).as("qv"), first(col("v")).as("v"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cands
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** q25 — the registered fixture through the external-query path. */
  def annLsh(embeddings: DataFrame, dim: Int = Dim): DataFrame =
    annLshQueries(embeddings, Hnsw.strideQueries(embeddings), dim)

  def annLsh(spark: SparkSession, dir: String): DataFrame =
    annLsh(Tables.embeddings(spark, dir))

  /** DuckDB twin of [[annLsh]]: regenerates the identical
    * `LshTables·LshPlanes` hyperplanes from md5 (same technique as
    * [[embedNearDupSql]]), buckets per table with the same bit order
    * (`ORDER BY j` within `j // LshPlanes`), joins candidates on
    * (table, bucket), and ranks by the same left-fold cosine — so the
    * whole LSH decision, not an approximation of it, is hash-checked. */
  val annLshSql: String = {
    val cos = s"(${VectorMath.dotSql("qe.v", "e.v", Dim)} / (qe.nrm * e.nrm))"
    s"""WITH hp AS (${Hyperplanes.planesCteSql(LshTables * LshPlanes, Dim).replace("\n", " ")}),
       |emb AS (${embCteSql.replace("\n", " ")}),
       |sig AS (
       |  SELECT e.vec_id, hp.j // $LshPlanes AS tbl,
       |    string_agg(CASE WHEN ${VectorMath.dotSql("e.v", "hp.h", Dim)} > 0 THEN '1' ELSE '0' END,
       |               '' ORDER BY hp.j) AS bucket
       |  FROM emb e CROSS JOIN hp GROUP BY e.vec_id, hp.j // $LshPlanes),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, b.vec_id
       |  FROM sig q JOIN sig b ON q.tbl = b.tbl AND q.bucket = b.bucket AND b.vec_id <> q.vec_id
       |  WHERE q.vec_id % $QueryStride = 0),
       |scored AS (
       |  SELECT c.query_id, c.vec_id, $cos AS cos
       |  FROM cand c
       |  JOIN emb qe ON qe.vec_id = c.query_id
       |  JOIN emb e ON e.vec_id = c.vec_id)
       |SELECT query_id, vec_id AS neighbor_id, rk, round(cos, 4) + 0.0 AS cos FROM (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |WHERE rk <= $TopK""".stripMargin
  }

  // ---- IVF ANN (scale path #2: coarse quantizer + multi-probe) ----

  val IvfCells = 16
  val IvfProbes = 4

  /** Coarse-quantizer fit: the first `nCells` vectors in `vec_id` order
    * as centroids — the cheap deterministic stand-in for a k-means job.
    * This is the ONLY place IVF touches the driver, and it is a separate
    * fit step by design: at 100 TB you fit centroids once on a sample,
    * cache them, and pass them to every [[annIvf]] query — the query
    * path itself never collects. */
  def fitCentroids(embeddings: DataFrame, nCells: Int = IvfCells): Seq[(Int, Seq[Double])] =
    embCast(embeddings).orderBy(col("vec_id")).limit(nCells).collect()
      .toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }

  /** IVF ANN over pre-fitted centroids (see [[fitCentroids]]): every
    * vector is assigned to its best-cosine cell, queries probe their
    * `nProbe` best cells, and exact cosine ranks the candidates.
    * Shuffle key is the cell id — candidate generation is an equi-join
    * on a small int, never a cross join; probed fraction ≈ nProbe/nCells
    * bounds work per query. Centroids are literals in the plan, so cell
    * assignment is a pure codegen'd projection over the scan — no join,
    * no collect, nothing driver-side in this path. */
  def annIvfQueries(corpus: DataFrame, centroids: Seq[(Int, Seq[Double])],
      queries0: DataFrame, nProbe: Int = IvfProbes, k: Int = TopK): DataFrame = {
    val emb = embCast(corpus)
    // per-row array of (cos-to-centroid, cell), sorted best-first
    def scoredCells(v: org.apache.spark.sql.Column) =
      reverse(array_sort(array(centroids.map { case (cid, cv) =>
        struct(VectorMath.cosineFast(v, typedLit(cv)).as("cos"),
          lit(cid).as("cell"))
      }.toIndexedSeq: _*)))
    val assigned = emb.withColumn("cell",
      element_at(scoredCells(col("v")), 1).getField("cell"))
    val queries = Hnsw.queryFrame(queries0)
      .select(col("query_id"), col("qv"),
        explode(transform(slice(scoredCells(col("qv")), 1, nProbe),
          s => s.getField("cell"))).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(queries)
      .join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      // no distinct: each vector has ONE cell and a query's probed cells
      // are distinct, so (query_id, vec_id) pairs are already unique
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** Pre-fitted IVF against the registered stride fixture. */
  def annIvf(embeddings: DataFrame, centroids: Seq[(Int, Seq[Double])],
      nProbe: Int = IvfProbes, k: Int = TopK): DataFrame =
    annIvfQueries(embeddings, centroids, Hnsw.strideQueries(embeddings),
      nProbe, k)

  /** Registered q25b: explicit fit-then-query composition (the fit is
    * the one collect, outside the query plan). */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    annIvf(emb, fitCentroids(emb))
  }

  /** DuckDB twin of [[fitCentroids]]+[[annIvf]]: re-derives the same
    * centroids (first `IvfCells` vectors by vec_id, cell = rank-1),
    * assigns cells with the same (cos DESC, cell DESC) order that
    * `reverse(array_sort(struct(cos, cell)))` produces, probes the same
    * `IvfProbes` cells per query, and ranks with the same left-fold
    * cosine — exact hash parity with the registered pipeline. */
  val annIvfSql: String = {
    val ccos = s"(${VectorMath.dotSql("e.v", "c.v", Dim)} / (e.nrm * c.nrm))"
    val cos = s"(${VectorMath.dotSql("qe.v", "e.v", Dim)} / (qe.nrm * e.nrm))"
    s"""WITH emb AS (${embCteSql.replace("\n", " ")}),
       |cent AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v, nrm
       |  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT $IvfCells)),
       |cellscore AS (
       |  SELECT e.vec_id, c.cell, $ccos AS ccos
       |  FROM emb e CROSS JOIN cent c),
       |ranked AS (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell DESC) AS crk
       |  FROM cellscore),
       |assigned AS (SELECT vec_id, cell FROM ranked WHERE crk = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cell FROM ranked
       |  WHERE vec_id % $QueryStride = 0 AND crk <= $IvfProbes),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.query_id),
       |scored AS (
       |  SELECT c.query_id, c.vec_id, $cos AS cos
       |  FROM cand c
       |  JOIN emb qe ON qe.vec_id = c.query_id
       |  JOIN emb e ON e.vec_id = c.vec_id)
       |SELECT query_id, vec_id AS neighbor_id, rk, round(cos, 4) + 0.0 AS cos FROM (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |WHERE rk <= $TopK""".stripMargin
  }

  // ---- q155: filtered ANN (metadata predicate inside the IVF path) ----

  /** Filtered vector search — the production retrieval shape where a
    * metadata predicate restricts candidates (per-tenant search,
    * license filters, freshness windows): here each query keeps only
    * neighbors from a DIFFERENT document source (the curation read
    * "who else has content like mine" behind contamination triage and
    * cross-source dedup). The filter applies INSIDE the IVF candidate
    * path — on the cell-joined pairs BEFORE any cosine math — so
    * filtered search costs less than unfiltered, never more (the
    * post-filter-then-top-k naive shape re-ranks rejected rows; this
    * one never scores them). Source labels ride the corpus side via
    * one doc_id equi-join; probing/assignment are exactly [[annIvf]].
    *
    * Caveat the scaladoc owes a 100 TB caller: a highly selective
    * predicate empties probed cells — raise nProbe (or partition the
    * index by the filter column) when matching density is low; the
    * per-query row count reports how many neighbors were actually
    * found (< k under starvation, never silently padded). */
  def annIvfFiltered(embeddings: DataFrame, docs: DataFrame,
      centroids: Seq[(Int, Seq[Double])], nProbe: Int = IvfProbes,
      k: Int = TopK): DataFrame = {
    val emb = embCast(embeddings)
    val srcOf = docs.select(col("doc_id").as("vec_id"), col("source"))
    val scoredCells = reverse(array_sort(array(centroids.map { case (cid, cv) =>
      struct(VectorMath.cosineFast(col("v"), typedLit(cv)).as("cos"),
        lit(cid).as("cell"))
    }.toIndexedSeq: _*)))
    val assigned = emb.withColumn("cell",
      element_at(scoredCells, 1).getField("cell"))
      .join(srcOf, "vec_id")
    val queries = emb.filter(col("vec_id") % QueryStride === 0)
      .join(srcOf, "vec_id")
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("source").as("qsource"),
        explode(transform(slice(scoredCells, 1, nProbe), s => s.getField("cell")))
          .as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(queries)
      .join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id") &&
        col("source") =!= col("qsource")) // predicate BEFORE any scoring
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** Registered q155: fit-then-query, filter = different source. */
  def annIvfFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    annIvfFiltered(emb, Tables.documents(spark, dir), fitCentroids(emb))
  }

  /** DuckDB twin: [[annIvfSql]] machinery + the source join and the
    * identical pre-scoring predicate. */
  val annIvfFilteredSql: String = {
    val ccos = s"(${VectorMath.dotSql("e.v", "c.v", Dim)} / (e.nrm * c.nrm))"
    val cos = s"(${VectorMath.dotSql("qe.v", "e.v", Dim)} / (qe.nrm * e.nrm))"
    s"""WITH emb AS (${embCteSql.replace("\n", " ")}),
       |src AS (SELECT doc_id AS vec_id, source FROM documents),
       |cent AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v, nrm
       |  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT $IvfCells)),
       |cellscore AS (
       |  SELECT e.vec_id, c.cell, $ccos AS ccos
       |  FROM emb e CROSS JOIN cent c),
       |ranked AS (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell DESC) AS crk
       |  FROM cellscore),
       |assigned AS (
       |  SELECT a.vec_id, a.cell, s.source
       |  FROM (SELECT vec_id, cell FROM ranked WHERE crk = 1) a
       |  JOIN src s ON s.vec_id = a.vec_id),
       |probes AS (
       |  SELECT r.vec_id AS query_id, r.cell, s.source AS qsource
       |  FROM ranked r JOIN src s ON s.vec_id = r.vec_id
       |  WHERE r.vec_id % $QueryStride = 0 AND r.crk <= $IvfProbes),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN assigned a ON p.cell = a.cell
       |    AND a.vec_id <> p.query_id AND a.source <> p.qsource),
       |scored AS (
       |  SELECT c.query_id, c.vec_id, $cos AS cos
       |  FROM cand c
       |  JOIN emb qe ON qe.vec_id = c.query_id
       |  JOIN emb e ON e.vec_id = c.vec_id)
       |SELECT query_id, vec_id AS neighbor_id, rk, round(cos, 4) + 0.0 AS cos FROM (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |WHERE rk <= $TopK""".stripMargin
  }

  // ---- #23 embedding near-duplicate pairs (shared LSH) ----

  val NearDupPlanes = 4
  val NearDupCos = 0.3

  /** Embedding near-dup: vectors in the same sign bucket with exact
    * cosine ≥ threshold. Bucketing bounds the pair join to within-bucket
    * candidates: Σ bucket² over 2^planes buckets. `planes` MUST be
    * sized to the corpus — buckets average n/2^planes, so pair work is
    * ~n²/2^planes; pick planes ≈ log2(n / targetBucket) (e.g. ~20
    * planes for 10^9 vectors at ~1k-vector buckets). The default 4
    * matches the oracle-checked q23 on the small testdata; the oracle
    * regenerates identical planes from md5 so it reproduces the LSH
    * decision exactly rather than approximating it. */
  def embedNearDup(embeddings: DataFrame, dim: Int = Dim,
      planes: Int = NearDupPlanes): DataFrame = {
    val emb = embCast(embeddings)
      .withColumn("bucket", Hyperplanes.bucket(col("v"), planes, dim))
    val a = emb.as("a")
    val b = emb.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", VectorMath.cosineFast(col("a.v"), col("b.v")))
      .filter(col("cos") >= NearDupCos)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    embedNearDup(Tables.embeddings(spark, dir))

  val embedNearDupSql: String = {
    val cos = s"(${VectorMath.dotSql("a.v", "b.v", Dim)} / (a.nrm * b.nrm))"
    s"""WITH hp AS (${Hyperplanes.planesCteSql(NearDupPlanes, Dim).replace("\n", " ")}),
       |emb AS (${embCteSql.replace("\n", " ")}),
       |sig AS (
       |  SELECT e.vec_id,
       |    string_agg(CASE WHEN ${VectorMath.dotSql("e.v", "hp.h", Dim)} > 0 THEN '1' ELSE '0' END,
       |               '' ORDER BY hp.j) AS bucket
       |  FROM emb e CROSS JOIN hp GROUP BY e.vec_id),
       |be AS (SELECT s.vec_id, s.bucket, e.v, e.nrm FROM sig s JOIN emb e ON s.vec_id = e.vec_id)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round($cos, 4) + 0.0 AS cos
       |FROM be a JOIN be b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE $cos >= $NearDupCos""".stripMargin
  }
}
