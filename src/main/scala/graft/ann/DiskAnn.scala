package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** DiskANN-style PQ-on-graph hybrid (Subramanya et al. NeurIPS 2019;
  * r15 verdict #8 — "a DiskANN-style PQ-on-graph hybrid if #1 lands
  * well"): the q312 per-shard graphs searched with a COMPRESSED
  * scorer. DiskANN's defining trick is that the beam walk reads only
  * PQ codes (RAM-resident at billions of vectors) while full vectors
  * live on disk and are touched ONLY to re-rank the final shortlist.
  * The Spark translation of that memory contract:
  *
  *  - BUILD: each shard's graph is built on full vectors (the paper
  *    builds at full precision too) — a one-time cost, exactly q312's.
  *  - TRAVERSAL: inside the shard task, every node is PQ-encoded
  *    against the driver-fitted q69 codebooks (broadcast literals);
  *    the beam's distance is the ADC approximation
  *    1 − (Σ_m t_m[code_m]) / (|q|·‖recon‖), with the per-query t_m
  *    tables (M·Ks dots) and per-node ‖recon‖ = √(Σ_m |cb_m[code]|²)
  *    precomputed — a distance evaluation is M array reads, never a
  *    64-double vector read. [[Hnsw.ShardGraph.searchBy]] injects it.
  *  - RE-RANK: the merged per-shard candidate union (NShards·ef ids
  *    per query — the only thing that leaves the shard) joins back to
  *    the corpus for exact cosine, window top-k. Full vectors are
  *    touched for exactly those candidate rows — the "disk" reads.
  *
  * The ADC ordering is coarser than exact cosine, so the beam is wider
  * than q312's ([[EfSearch]] = 48 vs 24): the audit prices that trade —
  * recall per candidate budget is the measured deliverable (q324).
  *
  * ROWS-ONLY for the same reason as q312 (sequential graph build), and
  * deterministic for the same reasons (plus the fit: [[Pq.fit]] is the
  * already-deterministic driver fit the q69 oracle re-derives). */
object DiskAnn {

  /** Per-shard beam width under the ADC scorer. Measured frontier at
    * sf0.1 (M=8/Ks=16 codes, NShards=4, vs the exact-scored walk's
    * 0.90 at ef=24 — q312 has since re-registered at ef=48/recall
    * 0.98, r16 verdict #5): ef 48 → recall 0.72, 64 → 0.795,
    * 96 → 0.90, 128 → 0.94. 96 — the compressed walk needs ~4× the
    * exact walk's beam for the SAME recall, and each evaluation is
    * M=8 code reads instead of 64 doubles, so traversal memory
    * traffic is still ~2× cheaper; that ratio IS the DiskANN trade
    * and q324 keeps it measured. */
  val EfSearch = 96

  private def embCast(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** The per-shard compressed scorer: PQ-encode the shard's nodes once
    * (codes + reconstruction norms), then per query build the M·Ks ADC
    * tables and walk the graph on code reads only. Returns the
    * candidate emitter [[Hnsw.shardedCandidates]] plugs in. */
  private def adcSearcher(bookArr: Array[Array[Array[Double]]], efSearch: Int)(
      g: Hnsw.ShardGraph, rows: Array[(Long, Array[Double])]):
      ((Long, Array[Double])) => Iterator[(Long, Long)] = {
    val sub = Pq.SubDim
    // PQ-encode every node once: codes + reconstruction norms
    val codes = Array.ofDim[Int](rows.length, Pq.M)
    val rnorm = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      val v = rows(i)._2
      var nrm2 = 0.0
      var m = 0
      while (m < Pq.M) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < bookArr(m).length) {
          val cb = bookArr(m)(j)
          var d2 = 0.0; var k = 0
          while (k < sub) {
            val diff = v(m * sub + k) - cb(k); d2 += diff * diff; k += 1
          }
          if (d2 < bestD) { bestD = d2; best = j }
          j += 1
        }
        codes(i)(m) = best
        val cb = bookArr(m)(best)
        var k = 0
        while (k < sub) { nrm2 += cb(k) * cb(k); k += 1 }
        m += 1
      }
      rnorm(i) = math.sqrt(nrm2)
      i += 1
    }
    { case (qid, qv) =>
      val qn = math.sqrt(qv.map(x => x * x).sum)
      // per-query ADC tables: t(m)(j) = dot(q_m, cb_m[j])
      val t = Array.tabulate(Pq.M, bookArr(0).length) { (m, j) =>
        val cb = bookArr(m)(j)
        var s = 0.0; var k = 0
        while (k < sub) { s += qv(m * sub + k) * cb(k); k += 1 }
        s
      }
      def adcDist(i: Int): Double = {
        var s = 0.0; var m = 0
        while (m < Pq.M) { s += t(m)(codes(i)(m)); m += 1 }
        val den = qn * rnorm(i)
        if (den == 0.0) 1.0 else 1.0 - s / den
      }
      g.searchBy(adcDist, efSearch).iterator
        .map { case (_, li) => (qid, g.idOf(li)) }
        .filter { case (q, nb) => nb != q }
    }
  }

  /** Exact re-rank of the query-bounded candidate union: join back to
    * the corpus for full vectors (the "disk" reads), window top-k. */
  private def rerank(corpus: DataFrame, queries: DataFrame,
      cands: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    // the candidate set is query-bounded (|queries|·NShards·ef rows) —
    // BROADCAST it against the corpus scan so the exact re-rank's
    // vector reads are one shuffle-free probe pass at any corpus size
    embCast(corpus).withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(Hnsw.queryFrame(queries)), Seq("query_id"))
      .withColumn("cos", VectorMath.cosineFast(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Ann.TopK)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        (round(col("cos"), 4) + 0.0).as("cos"))
  }

  /** DiskANN-style top-k of `queries` against `corpus` — the
    * external-query surface (r16 verdict #1): code-scored graph walk
    * per shard (queries cogrouped in, never driver-collected), exact
    * join-back re-rank. `books` defaults to a fresh [[Pq.fit]]; a
    * query-many caller passes [[IndexStore.loadCodebooks]] output.
    * Output shape = q24's. */
  def annDiskAnnQueries(corpus: DataFrame, queries: DataFrame,
      efSearch: Int = EfSearch, nShards: Int = Hnsw.NShards,
      qBlocks: Int = 1,
      books0: Seq[(Int, Int, Seq[Double])] = Nil): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = if (books0.nonEmpty) books0 else Pq.fit(corpus)
    val bookArr: Array[Array[Array[Double]]] =
      Array.tabulate(Pq.M)(m => Pq.bookOf(books, m).map(_._2.toArray).toArray)
    val emb = embCast(corpus).as[(Long, Array[Double])]
    val cands = Hnsw.shardedCandidates(emb, Hnsw.queryCast(queries),
      nShards, qBlocks) { rows =>
        val g = new Hnsw.ShardGraph(rows.map(_._1), rows.map(_._2)).build()
        adcSearcher(bookArr, efSearch)(g, rows)
      }
    rerank(corpus, queries, cands.toDF("query_id", "neighbor_id"))
  }

  /** q323 — the registered fixture: [[Hnsw.strideQueries]] routed
    * through the external-query path. */
  def annDiskAnn(embeddings: DataFrame,
      efSearch: Int = EfSearch, nShards: Int = Hnsw.NShards): DataFrame =
    annDiskAnnQueries(embeddings, Hnsw.strideQueries(embeddings),
      efSearch, nShards)

  /** DiskANN query-many against a PERSISTED [[Hnsw.buildIndex]] index:
    * restore adjacency (no rebuild), PQ-encode from the index rows'
    * vectors, walk on codes, re-rank exactly. Pass persisted codebooks
    * to make the whole path fit-free. */
  def annDiskAnnFromIndex(index: DataFrame, corpus: DataFrame,
      queries: DataFrame, efSearch: Int = EfSearch,
      nShards: Int = Hnsw.NShards, qBlocks: Int = 1,
      books0: Seq[(Int, Int, Seq[Double])] = Nil): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val books = if (books0.nonEmpty) books0 else Pq.fit(corpus)
    val bookArr: Array[Array[Array[Double]]] =
      Array.tabulate(Pq.M)(m => Pq.bookOf(books, m).map(_._2.toArray).toArray)
    val nb = math.max(1, qBlocks)
    val rowsKeyed = index.as[Hnsw.GraphRow].flatMap { r =>
      (0 until nb).iterator.map(bk => (r.shard * nb + bk, r))
    }
    val queriesKeyed = Hnsw.queryCast(queries).flatMap { case (qid, qv) =>
      val bk = math.floorMod(Hnsw.mix64(qid), nb.toLong).toInt
      (0 until nShards).iterator.map(s => (s * nb + bk, qid, qv))
    }
    val cands = rowsKeyed.groupByKey(_._1).cogroup(queriesKeyed.groupByKey(_._1)) {
      (_, rit, qit) =>
        val shardRows = rit.map(_._2).toArray
        if (shardRows.isEmpty) Iterator.empty[(Long, Long)]
        else {
          val sorted = shardRows.sortBy(_.pos)
          val g = Hnsw.restoreGraph(sorted)
          val rows = sorted.map(r => (r.vec_id, r.v.toArray))
          val search = adcSearcher(bookArr, efSearch)(g, rows)
          qit.flatMap { case (_, qid, qv) => search((qid, qv)) }
        }
    }
    rerank(corpus, queries, cands.toDF("query_id", "neighbor_id"))
  }

  def docAnnDiskAnn(spark: SparkSession, dir: String): DataFrame =
    annDiskAnn(Tables.embeddings(spark, dir))

  /** q324 — recall of the code-scored walk against brute truth (the
    * q241/q313 audit shape), PLUS the exact-scored q312 walk's recall
    * at ITS beam width in the same row: the pair prices what the
    * compressed traversal costs in recall per candidate budget. */
  def diskAnnRecall(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.localCheckpoint(true)
    val truth = Ann.annBrute(emb)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    def hits(returned: DataFrame, tag: String): DataFrame = {
      val perQuery = truth
        .join(returned.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id")
        .agg(expr("CAST(count(1) AS BIGINT)").as("n_hit_q"))
      truth.select("query_id").distinct()
        .join(perQuery, Seq("query_id"), "left")
        .selectExpr("coalesce(n_hit_q, CAST(0 AS BIGINT)) AS n_hit_q")
        .agg(expr("CAST(sum(n_hit_q) AS BIGINT)").as(s"hit_$tag"),
          expr("CAST(min(n_hit_q) AS BIGINT)").as(s"min_$tag"),
          expr("CAST(count(1) AS BIGINT)").as(s"nq_$tag"))
    }
    val disk = hits(annDiskAnn(emb), "disk")
    val hnsw = hits(Hnsw.annHnsw(emb), "hnsw")
    truth.agg(expr("CAST(count(1) AS BIGINT)").as("n_truth"))
      .crossJoin(disk).crossJoin(hnsw)
      .selectExpr("nq_disk AS n_queries", s"CAST(${Ann.TopK} AS INT) AS k",
        "n_truth",
        "round(CAST(hit_disk AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_diskann",
        s"round(CAST(min_disk AS DOUBLE) / ${Ann.TopK}.0, 6) + 0.0 AS worst_diskann",
        "round(CAST(hit_hnsw AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_hnsw")
  }

  def docDiskAnnRecall(spark: SparkSession, dir: String): DataFrame =
    diskAnnRecall(Tables.embeddings(spark, dir))
}
