package graft.ann

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for fitted ANN index artifacts — the production shape is
  * fit-once / query-many ACROSS JOBS: centroids (IVF, [[Ann.fitCentroids]])
  * and codebooks (PQ, [[Pq.fit]]) get fitted on a sample in one job,
  * saved, and every later query job loads them instead of re-fitting
  * (the reference equivalent is a model artifact on disk between
  * pipeline stages).
  *
  * Artifacts are DIMENSION-GRADE by construction (IVF: nCells rows;
  * PQ: M·Ks rows — hundreds of doubles arrays, not data-sized), so a
  * driver-side load is the correct shape: the arrays become plan
  * literals in the query projections, exactly as the in-memory fit
  * results do. Storage is plain parquet — schema-checked on load,
  * readable by any engine, and stable across Spark versions. */
object IndexStore {

  /** Save IVF centroids as parquet rows (cell, cv). */
  def saveCentroids(spark: SparkSession, centroids: Seq[(Int, Seq[Double])],
      path: String): Unit = {
    import spark.implicits._
    centroids.toDF("cell", "cv")
      .repartition(1).sortWithinPartitions("cell")
      .write.mode("overwrite").parquet(path)
  }

  /** Load IVF centroids; cell order restored, schema verified. */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Int, Seq[Double])] = {
    val df = spark.read.parquet(path)
    require(df.columns.toSeq == Seq("cell", "cv"),
      s"not a centroid index: columns ${df.columns.mkString(",")}")
    df.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
  }

  /** Save PQ codebooks as parquet rows (m, code, cv). */
  def saveCodebooks(spark: SparkSession, books: Seq[(Int, Int, Seq[Double])],
      path: String): Unit = {
    import spark.implicits._
    books.toDF("m", "code", "cv")
      .repartition(1).sortWithinPartitions("m", "code")
      .write.mode("overwrite").parquet(path)
  }

  /** Load PQ codebooks; (m, code) order restored, schema verified. */
  def loadCodebooks(spark: SparkSession, path: String): Seq[(Int, Int, Seq[Double])] = {
    val df = spark.read.parquet(path)
    require(df.columns.toSeq == Seq("m", "code", "cv"),
      s"not a codebook index: columns ${df.columns.mkString(",")}")
    df.orderBy("m", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq
  }

  /** Save an SQ8 grid ([[Sq.fit]] output) as parquet rows (j, mn, span)
    * — d rows of two doubles, the smallest artifact in the store. */
  def saveSqCodebook(spark: SparkSession, cb: Sq.SqCodebook,
      path: String): Unit = {
    import spark.implicits._
    cb.mn.indices.map(j => (j, cb.mn(j), cb.span(j)))
      .toDF("j", "mn", "span")
      .repartition(1).sortWithinPartitions("j")
      .write.mode("overwrite").parquet(path)
  }

  /** Load an SQ8 grid; dimension order restored, schema verified. */
  def loadSqCodebook(spark: SparkSession, path: String): Sq.SqCodebook = {
    val df = spark.read.parquet(path)
    require(df.columns.toSeq == Seq("j", "mn", "span"),
      s"not an SQ codebook: columns ${df.columns.mkString(",")}")
    val rows = df.orderBy("j").collect()
    Sq.SqCodebook(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  private val GraphCols =
    Set("shard", "pos", "vec_id", "v", "level", "edges", "is_entry")

  /** Save HNSW/DiskANN shard graphs ([[Hnsw.buildIndex]] output). The
    * graph index is CORPUS-SIZED, so unlike the centroid/codebook
    * artifacts above it stays distributed end to end: written as
    * shard-partitioned parquet, reloaded shard-by-shard inside query
    * tasks ([[Hnsw.annHnswFromIndex]]), never collected. Partitioning
    * by shard makes a single-shard probe a pruned scan. */
  def saveShardGraphs(index: org.apache.spark.sql.DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Load shard graphs; schema verified, column types restored to the
    * [[Hnsw.GraphRow]] shape (partition columns come back as the
    * discovered type, so re-cast). */
  def loadShardGraphs(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.toSet == GraphCols,
      s"not a shard-graph index: columns ${df.columns.mkString(",")}")
    df.select(col("shard").cast("int"), col("pos").cast("int"),
      col("vec_id").cast("long"), col("v").cast("array<double>"),
      col("level").cast("int"), col("edges").cast("array<array<int>>"),
      col("is_entry").cast("boolean"))
  }
}
