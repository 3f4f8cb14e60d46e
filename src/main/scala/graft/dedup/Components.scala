package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Connected components over near-duplicate candidate pairs — the step
  * a dedup pipeline needs AFTER pair generation: q20/q22/q23 emit
  * PAIRS, but the keep/drop decision is per GROUP (keep one canonical
  * doc per duplicate cluster). Reference provenance: the reference's
  * dedup is pandas `validate='1:1'` merges (school_outcomes_etl.py) —
  * pair-level; grouping transitive near-dups is the scale
  * generalization every LLM-corpus pipeline ships.
  *
  * Algorithm: distributed min-label propagation with pointer jumping.
  * Each node starts labeled with its own id; every iteration each node
  * takes the min of (its label, its neighbors' labels) and then jumps
  * `L(v) := L(L(v))`. Neighbor propagation alone converges in
  * O(diameter) rounds — fine for near-dup clusters, which are
  * quasi-cliques of diameter ~2 — and the pointer-jump step contracts
  * label chains geometrically, so path-shaped worst cases converge in
  * O(log n) rounds instead (the classic Shiloach–Vishkin / "hash-to-min"
  * trick, cf. Kiveris et al., "Connected Components in MapReduce and
  * Beyond").
  *
  * Scale shape: per round, two hash joins + one min-aggregate, all
  * keyed on node id — O(|E|) shuffle per round, never materializing
  * anything per-component. Each round's labels are checkpointed to
  * truncate the growing lineage (iterative plans otherwise re-execute
  * the whole prefix) — executor-local by default, or against a
  * reliable store via `checkpointDir` for cluster runs (see the param
  * doc); the convergence check is a count on the already-checkpointed
  * frame, so each round costs exactly one pass.
  */
object Components {

  /** Min-id connected components.
    *
    * @param edges undirected candidate pairs, columns (`doc_a`,`doc_b`).
    *              Endpoints are expected to be ⊆ the `nodes` universe:
    *              an out-of-universe endpoint is ADOPTED into the output
    *              from round 1 (it enters the label frame through the
    *              neighbor step), and if its id is smaller than the real
    *              members' it becomes the cluster_id. Pass
    *              `validateEdges = true` to fail fast instead (one extra
    *              anti-join pass over the edge set).
    * @param nodes node universe, column `doc_id` — nodes with no edge
    *              come out as singleton clusters of themselves
    * @param checkpointDir lineage-truncation mode for the iterative
    *              loop. None (default) uses `localCheckpoint`: blocks
    *              live on executors — fastest, the right call on
    *              local[32]/small clusters, but an executor loss
    *              mid-iteration kills the query. Some(dir) writes each
    *              round's labels as parquet under `dir` and re-reads
    *              them (a reliable checkpoint fully under our control,
    *              unlike `Dataset.checkpoint` whose per-round files
    *              accumulate until application exit): rounds survive
    *              executor loss — the right call for a 1000-executor
    *              run. Each invocation namespaces its files under a
    *              fresh `dir/cc-<uuid>/`, so concurrent or repeated
    *              calls may safely share one `dir` — no call can
    *              overwrite files a still-live result frame of another
    *              call lazily reads. At most the last TWO rounds' files
    *              are kept (the previous round is still referenced by
    *              the convergence count); older rounds are deleted as
    *              the loop advances. The returned frame reads from that
    *              namespace — it is NOT deletable until the result has
    *              been fully consumed, and nothing here deletes it, so
    *              a long-lived shared `dir` accumulates one final-round
    *              parquet per call. Use
    *              [[connectedComponentsCheckpointed]] to get the
    *              namespace path back and delete it yourself once done.
    * @return (doc_id, cluster_id, cluster_size); cluster_id = min
    *         doc_id of the component
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame, maxIter: Int = 50,
      checkpointDir: Option[String] = None,
      validateEdges: Boolean = false): DataFrame =
    ccImpl(edges, nodes, maxIter,
      checkpointDir.map(d => s"$d/cc-${java.util.UUID.randomUUID()}"),
      validateEdges)

  /** Reliable-checkpoint [[connectedComponents]] that also returns the
    * per-invocation namespace directory holding the final round's
    * parquet (which the result frame lazily reads). Contract: consume
    * the frame first, then delete the returned path — that is the ONLY
    * cleanup ever needed, since earlier rounds are already pruned as
    * the loop advances. */
  def connectedComponentsCheckpointed(edges: DataFrame, nodes: DataFrame,
      checkpointDir: String, maxIter: Int = 50,
      validateEdges: Boolean = false): (DataFrame, String) = {
    val ns = s"$checkpointDir/cc-${java.util.UUID.randomUUID()}"
    (ccImpl(edges, nodes, maxIter, Some(ns), validateEdges), ns)
  }

  private def ccImpl(edges: DataFrame, nodes: DataFrame, maxIter: Int,
      namespace: Option[String], validateEdges: Boolean): DataFrame = {
    require(edges.columns.toSeq.contains("doc_a") && edges.columns.toSeq.contains("doc_b"),
      s"edges needs (doc_a, doc_b), got ${edges.columns.mkString(",")}")
    val ckpt: DataFrame => DataFrame = namespace match {
      case Some(base) =>
        // per-invocation namespace (cc-<uuid>, minted by the callers):
        // deterministic paths under a shared dir would let a second
        // call clobber files this call's result frame still lazily reads
        val spark = nodes.sparkSession
        val hconf = spark.sparkContext.hadoopConfiguration
        var round = 0
        df => {
          round += 1
          val path = s"$base/labels-$round"
          df.write.mode("overwrite").parquet(path)
          if (round > 2) {
            // round-1 is still read by this round's convergence count;
            // round-2 is not referenced by anything anymore
            val old = new org.apache.hadoop.fs.Path(s"$base/labels-${round - 2}")
            old.getFileSystem(hconf).delete(old, true)
          }
          spark.read.parquet(path)
        }
      case None => df => df.localCheckpoint(true)
    }
    if (validateEdges) {
      val ids = nodes.select(col("doc_id"))
      val stray = edges.select(col("doc_a").as("doc_id"))
        .unionByName(edges.select(col("doc_b").as("doc_id")))
        .join(ids, Seq("doc_id"), "left_anti")
      val n = stray.count()
      require(n == 0, s"$n edge endpoint(s) outside the node universe " +
        s"(e.g. ${stray.limit(3).collect().map(_.get(0)).mkString(", ")})")
    }
    // symmetrize once; both directions are needed because min labels
    // flow "downhill" along every edge
    val sym = edges.select(col("doc_a").as("node"), col("doc_b").as("nbr"))
      .unionByName(edges.select(col("doc_b").as("node"), col("doc_a").as("nbr")))
      .distinct()
      .persist()
    sym.count() // materialize before the loop so each round reuses it

    var labels = ckpt(nodes.select(col("doc_id").as("node"))
      .withColumn("label", col("node")))
    var delta = 1L
    var it = 0
    while (delta > 0 && it < maxIter) {
      // 1) neighbor step: candidate label = min over incident edges
      val fromNbrs = sym
        .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
        .select(col("node"), col("label"))
      val stepped = labels.select(col("node"), col("label"))
        .unionByName(fromNbrs)
        .groupBy("node").agg(min("label").as("label"))
      // 2) pointer jump: L(v) := L(L(v)). Every label IS a node id (the
      // invariant: labels only ever hold ids of same-component nodes),
      // so the inner join keeps all rows.
      val jumped = stepped
        .join(labels.select(col("node").as("label"), col("label").as("jl")), "label")
        .select(col("node"), least(col("label"), col("jl")).as("label"))
      val jumpedCk = ckpt(jumped)
      delta = jumpedCk.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") < col("old")).count()
      labels = jumpedCk
      it += 1
    }
    sym.unpersist()
    if (delta > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    val w = Window.partitionBy(col("cluster_id"))
    labels
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
  }

  /** Registered q39: cluster the MinHash LSH candidate pairs of the
    * `documents` table into duplicate groups; every document gets a row
    * (singletons cluster to themselves). */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    connectedComponents(Dedup.dedupMinhash(docs), docs)
  }

  /** DuckDB twin: min reachable id per node via a recursive CTE over the
    * same MinHash pairs ([[Dedup.dedupMinhashSql]] verbatim as the edge
    * source, so the two engines cluster the identical pair set). */
  val dedupClusterSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT * FROM (${Dedup.dedupMinhashSql.replace("\n", " ")})
       |),
       |edges AS (
       |  SELECT doc_a AS node, doc_b AS nbr FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS node, doc_a AS nbr FROM pairs
       |),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS label FROM documents
       |  UNION
       |  SELECT e.node, r.label FROM edges e JOIN reach r ON r.node = e.nbr
       |),
       |lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY 1)
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM lab""".stripMargin
}
