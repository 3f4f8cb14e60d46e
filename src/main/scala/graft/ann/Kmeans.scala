package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** Lloyd's k-means over the `embeddings` table — the real fit behind
  * the IVF coarse quantizer ([[Ann.fitCentroids]] is the cheap
  * stand-in; this runs actual assign/update rounds). Deterministic by
  * construction so it carries an exact DuckDB oracle: init is the
  * first k vectors by vec_id, a fixed number of Lloyd rounds, and
  * cosine assignment with a fixed tie order.
  *
  * The update's sufficient statistics are FIXED-POINT: per-dimension
  * sums of `round(x·1e9)` as integers (the q32 regression technique),
  * so the sum is order-independent — partition count, merge order, and
  * engine cannot change it — and the centroid `round(sum/1e9/n, 6)`
  * divides identical exact integers on both engines. The oracle is
  * exact by construction, not probabilistically ("snapping") safe.
  * BOUND: the long sum is cast to double before the division, so
  * exactness holds while a per-(cluster,dim) |Σ round(x·1e9)| stays
  * below 2^53 ≈ 9e15 — i.e. up to ~9e6 unit-scale vectors per cluster.
  * Beyond that (full-corpus clusters at 1e9+ docs), either fit on a
  * sample (the standard practice, and what the scaladoc below
  * recommends at 100 TB) or divide in two exact steps before the
  * double conversion.
  *
  * Scale shape: assignment is a pure projection against k·dim literal
  * centroids (no join, no shuffle — identical to [[Ann.annIvf]]'s cell
  * assignment); each update is ONE map-side-combined aggregate of
  * k·dim running sums; only k·dim doubles ever reach the driver per
  * round. At 100 TB you run the fit on a sample and the final
  * assignment over the full corpus — both paths are the ones here.
  */
object Kmeans {

  val K = 8
  val Iters = 2

  private def embCast(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Best-cosine cluster per vector against literal centroids; ties
    * break toward the HIGHER cell id (the `reverse(array_sort)` order,
    * mirrored as `ORDER BY cos DESC, cell DESC` in the oracle). */
  private def assign(emb: DataFrame, cent: Seq[(Int, Seq[Double])]): DataFrame = {
    val scored = reverse(array_sort(array(cent.map { case (cid, cv) =>
      struct(VectorMath.cosineFast(col("v"), typedLit(cv)).as("cos"),
        lit(cid).as("cell"))
    }.toIndexedSeq: _*)))
    emb
      .withColumn("best", element_at(scored, 1))
      .select(col("vec_id"), col("v"),
        col("best").getField("cell").as("cluster"),
        col("best").getField("cos").as("cos"))
  }

  /** Lloyd rounds; empty clusters keep their previous centroid.
    *
    * The iteration plan is LITERAL-FREE (r15): centroids ride a
    * broadcast DataFrame and the best cell is `max(struct(cos, cell))`
    * (lexicographic struct max = highest cos, tie toward the higher
    * cell — exactly [[assign]]'s order), so every round reuses ONE
    * compiled plan. The previous literal-centroid projection compiled
    * a FRESH whole-stage-codegen plan per round (the literals are
    * baked into the generated source) — measured 7.7 s vs 2.2 s for a
    * 3-round fit at sf0.1, pure Janino. The FINAL full-corpus
    * assignment (one plan per job) keeps the literal projection —
    * that is the right 100 TB shape, one compile amortized over the
    * corpus scan. Arithmetic is unchanged: same cosine expression on
    * the same doubles, same fixed-point integer mean — the oracle
    * text needs no edit. */
  def fit(embeddings: DataFrame, k: Int = K, iters: Int = Iters,
      dim: Int = Ann.Dim): Seq[(Int, Seq[Double])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val emb = embCast(embeddings).persist()
    var cent: Seq[(Int, Seq[Double])] =
      emb.orderBy(col("vec_id")).limit(k).collect()
        .toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 0 until iters) {
      val centDf = cent.toDF("cell", "cv")
      // fixed-point mean: exact integer sum of round(x*1e9), then one
      // deterministic double division chain — no float-accumulation
      // order anywhere
      val meanCols = (0 until dim).map(i =>
        round(sum(round(element_at(col("v"), i + 1) * 1e9).cast("long"))
          .cast("double") / 1e9 / count(lit(1)), 6).as(s"d$i"))
      val upd = emb.crossJoin(broadcast(centDf))
        .groupBy(col("vec_id"))
        .agg(max(struct(
            VectorMath.cosineFast(col("v"), col("cv")).as("cos"),
            col("cell"))).getField("cell").as("cluster"),
          first(col("v")).as("v"))
        .groupBy(col("cluster"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (0 until dim).map(i => r.getDouble(i + 1)))
        .toMap
      cent = cent.map { case (cid, prev) => (cid, upd.getOrElse(cid, prev)) }
    }
    emb.unpersist()
    cent
  }

  /** Registered q45: fit (the eager driver step, k·dim doubles) then
    * assign the whole corpus with the final centroids. */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = fit(emb)
    val w = Window.partitionBy(col("cluster"))
    assign(embCast(emb), cent)
      .select(col("vec_id"), col("cluster"),
        (round(col("cos"), 4) + 0.0).as("cos"),
        count(lit(1)).over(w).as("cluster_size"))
  }

  /** The full fit-then-assign CTE chain (emb → cent0 → Iters unrolled
    * assign/update rounds → final assignment `fin(vec_id, cell, cos)`)
    * — shared by the q45 oracle and the q56 SemDeDup oracle. */
  private[graft] val fitCtesSql: String = {
    val dim = Ann.Dim
    def asgCte(name: String, cent: String): String = {
      val cos = VectorMath.cosineSql("e.v", "c.v", dim)
      s"""$name AS (
         |  SELECT vec_id, cell, cos FROM (
         |    SELECT e.vec_id, c.cell, $cos AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.cell DESC) AS rk
         |    FROM emb e CROSS JOIN $cent c)
         |  WHERE rk = 1)""".stripMargin
    }
    def updCte(asg: String, prev: String, next: String): String =
      s"""${next}_u AS (
         |  SELECT cluster AS cell, pos,
         |    round((sum(fix) / 1.0E9) / count(*), 6) AS a
         |  FROM (SELECT cluster, pos, CAST(round(val * 1.0E9) AS BIGINT) AS fix
         |        FROM (SELECT $asg.cell AS cluster, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS val
         |              FROM $asg JOIN emb e ON $asg.vec_id = e.vec_id))
         |  GROUP BY 1, 2),
         |$next AS (
         |  SELECT p.cell, coalesce(u.vlist, p.v) AS v FROM $prev p
         |  LEFT JOIN (SELECT cell, list(a ORDER BY pos) AS vlist FROM ${next}_u GROUP BY cell) u
         |    ON u.cell = p.cell)""".stripMargin
    s"""emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v
       |  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT $K)),
       |${asgCte("asg1", "cent0").replace("\n", " ")},
       |${updCte("asg1", "cent0", "cent1").replace("\n", " ")},
       |${asgCte("asg2", "cent1").replace("\n", " ")},
       |${updCte("asg2", "cent1", "cent2").replace("\n", " ")},
       |${asgCte("fin", "cent2").replace("\n", " ")}""".stripMargin
  }

  /** Parameterized Lloyd-fit CTE chain for OTHER oracles that embed a
    * k-means coarse quantizer (IvfPq's q145/q241): init = first `k`
    * vectors of the enclosing `emb(vec_id, v)` CTE, `iters` unrolled
    * assign/update rounds (identical fixed-point update text as
    * [[fitCtesSql]]), every CTE name carrying `p` as a collision
    * prefix. The final centroid CTE is `${p}cent${iters}(cell, v)` —
    * no trailing assignment CTE (quantizer consumers rank cells
    * themselves).
    *
    * Every CTE here is `AS MATERIALIZED`: consumers reference the
    * final centroids many times (IvfPq's cent feeds cellscore, resid,
    * qp, and M per-subspace ccl CTEs), and DuckDB re-INLINES a plain
    * CTE per reference — with a 3-round fit tree behind it that
    * re-expansion compounds exponentially (measured: the r15 q241
    * oracle OOM'd before these hints; sub-second after). */
  private[graft] def coarseCtes(k: Int, iters: Int, p: String,
      dim: Int = Ann.Dim): String = {
    def asgCte(name: String, cent: String): String = {
      val cos = VectorMath.cosineSql("e.v", "c.v", dim)
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, cell, cos FROM (
         |    SELECT e.vec_id, c.cell, $cos AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.cell DESC) AS rk
         |    FROM emb e CROSS JOIN $cent c)
         |  WHERE rk = 1)""".stripMargin
    }
    def updCte(asg: String, prev: String, next: String): String =
      s"""${next}_u AS MATERIALIZED (
         |  SELECT cluster AS cell, pos,
         |    round((sum(fix) / 1.0E9) / count(*), 6) AS a
         |  FROM (SELECT cluster, pos, CAST(round(val * 1.0E9) AS BIGINT) AS fix
         |        FROM (SELECT $asg.cell AS cluster, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS val
         |              FROM $asg JOIN emb e ON $asg.vec_id = e.vec_id))
         |  GROUP BY 1, 2),
         |$next AS MATERIALIZED (
         |  SELECT p.cell, coalesce(u.vlist, p.v) AS v FROM $prev p
         |  LEFT JOIN (SELECT cell, list(a ORDER BY pos) AS vlist FROM ${next}_u GROUP BY cell) u
         |    ON u.cell = p.cell)""".stripMargin
    val init =
      s"""${p}cent0 AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v
         |  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${asgCte(s"${p}asg$i", s"${p}cent${i - 1}").replace("\n", " ")},
         |${updCte(s"${p}asg$i", s"${p}cent${i - 1}", s"${p}cent$i").replace("\n", " ")}""".stripMargin
    }
    (init.replace("\n", " ") +: rounds).mkString(",\n")
  }

  /** DuckDB twin: same init, `Iters` unrolled assign/update rounds
    * (per-dim fixed-point mean over exact integer sums, empty cells
    * coalesce to the previous centroid), then the final assignment. */
  val kmeansClustersSql: String =
    s"""WITH $fitCtesSql
       |SELECT vec_id, cell AS cluster, round(cos, 4) + 0.0 AS cos,
       |  count(*) OVER (PARTITION BY cell) AS cluster_size
       |FROM fin""".stripMargin

  // ---- q56: SemDeDup (cluster-then-prune semantic dedup) ----

  /** Within-cluster cosine threshold above which two vectors are
    * semantic duplicates (SemDeDup, Abbas et al. 2023 — public
    * arXiv:2303.09540 recipe: k-means the embeddings, then prune
    * near-identical pairs inside each cluster only). */
  val SemDedupCos = 0.3

  /** q56: the exact→near→semantic dedup ladder's top rung. Clusters
    * from the SAME fit as q45, then a within-cluster pair join keeps a
    * vector only if it has NO smaller-id neighbor at cosine ≥
    * [[SemDedupCos]]; `dup_of` names the smallest such neighbor.
    *
    * SEMANTICS — the PARALLEL independence-free variant of SemDeDup's
    * prune, not the sequential greedy scan: drops are decided from the
    * ORIGINAL pair set simultaneously, so a similarity chain 1–2–3
    * (with 1–3 dissimilar) drops BOTH 2 and 3, where a sequential scan
    * would re-admit 3 after 2's removal; consequently `dup_of` may
    * itself name a dropped row (3's dup_of is 2). The min-id member of
    * every duplicate SET is always kept, so each set retains ≥1
    * canonical: follow the dup_of chain — or compose the pair set with
    * q39's connected components — when a kept transitive canonical is
    * needed. This one-shot rule is what makes the operator a pure
    * pair-join (no iteration), and the oracle reproduces it exactly.
    *
    * Scale shape: this is the published algorithm's own bound — the
    * pair join is an equi-join on cluster id, so pair work is
    * Σ cluster², controlled by `k` (pick k ≈ n/targetCluster at corpus
    * scale — exposed here precisely so that control is reachable; the
    * fit cost is q45's, assignment is a projection). Cosine is the
    * fused single-pass native expression; the threshold comparison is
    * exact on both engines (left-fold dot product), so the oracle
    * reproduces the keep/drop decision bit-for-bit. The registered q56
    * uses the defaults (k=[[K]], iters=[[Iters]]) so the oracle's
    * unrolled CTE chain stays in lockstep. */
  def semDedup(spark: SparkSession, dir: String, k: Int = K,
      iters: Int = Iters, cosT: Double = SemDedupCos): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = fit(emb, k, iters)
    val asg = assign(embCast(emb), cent).select(col("vec_id"), col("cluster"), col("v"))
    val dup = asg.as("a")
      .join(asg.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .filter(VectorMath.cosineFast(col("a.v"), col("b.v")) >= cosT)
      .groupBy(col("b.vec_id").as("vec_id"))
      .agg(min(col("a.vec_id")).as("dup_of"))
    asg.select(col("vec_id"), col("cluster"))
      .join(dup, Seq("vec_id"), "left")
      .withColumn("keep", col("dup_of").isNull.cast("int"))
      .select(col("vec_id"), col("cluster"), col("keep"), col("dup_of"))
  }

  /** DuckDB twin: shared fit CTEs, same pair predicate, same greedy
    * min-id canonical rule. */
  val semDedupSql: String = {
    val cos = VectorMath.cosineSql("a.v", "b.v", Ann.Dim)
    s"""WITH $fitCtesSql,
       |asgv AS (SELECT f.vec_id, f.cell, e.v FROM fin f JOIN emb e USING (vec_id)),
       |dup AS (
       |  SELECT b.vec_id, min(a.vec_id) AS dup_of
       |  FROM asgv a JOIN asgv b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE $cos >= $SemDedupCos
       |  GROUP BY b.vec_id)
       |SELECT f.vec_id, f.cell AS cluster,
       |  CAST(d.dup_of IS NULL AS INT) AS keep, d.dup_of
       |FROM fin f LEFT JOIN dup d ON f.vec_id = d.vec_id""".stripMargin
  }
}
