package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, count, lit, max, min}

/** Table sinks re-expressing the reference's load semantics on parquet
  * (SURVEY.md §2 #32–34).
  *
  * - [[ReplaceSink]]: `if_exists='replace'` full-table load
  *   (school_outcomes_etl.py) — overwrite the whole dataset.
  * - [[KeyedOverwriteSink]]: the reference's delete-and-append by county
  *   (election_results_etl.py:128-140) — Spark's dynamic partition
  *   overwrite replaces ONLY the partitions present in the incoming
  *   frame, which is the 100 TB-safe version: re-loading one county
  *   never rewrites the other 99.9% of the table, and re-runs are
  *   idempotent (same DAG-re-run semantics the reference relies on).
  * - [[PartitionedParquet]]: partitioned + sorted physical layout so
  *   downstream scans get partition pruning and per-file clustering
  *   (min/max skipping) on the sort key.
  */
object Sinks {

  object ReplaceSink {
    def write(df: DataFrame, path: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(path)
  }

  object KeyedOverwriteSink {
    /** Replace only the key-partitions present in `df`, leaving all
      * other partitions untouched. The overwrite mode is a PER-WRITE
      * option, not a session-conf mutation: toggling the session conf
      * races with concurrent writers on the same SparkSession (the
      * other writer could pick up 'static' and wipe the whole table). */
    def write(df: DataFrame, path: String, keyCol: String): Unit =
      df.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(keyCol)
        .parquet(path)
  }

  /** JDBC full-replace load — the reference's
    * `to_sql(if_exists='replace')` (school_outcomes_etl.py:170-174) as a
    * Spark JDBC write. SaveMode.Overwrite drops and recreates the remote
    * table (set `truncate=true` in options to keep the existing DDL and
    * TRUNCATE instead). Parallelism = the frame's partitions, one remote
    * connection each — coalesce before writing if the database can't
    * take that many writers. */
  object JdbcReplace {
    def write(df: DataFrame, url: String, table: String,
        options: Map[String, String] = Map.empty): Unit =
      // DataFrameWriter.jdbc merges the Properties into writer options,
      // so one options path serves both connection and writer settings
      df.write.mode(SaveMode.Overwrite)
        .jdbc(url, table, graft.sources.Jdbc.props(options))
  }

  /** JDBC delete-and-append by key — the reference's per-county load
    * (election_results_etl.py:128-140: `DELETE FROM … WHERE county = …`
    * then append). Deletes exactly the key values present in the
    * incoming frame (one transaction, batched parameterized deletes),
    * then appends — so re-running a load for one county is idempotent
    * and never touches the others, mirroring
    * [[KeyedOverwriteSink]]'s dynamic-partition-overwrite semantics on
    * an RDBMS. The delete+append pair is NOT one transaction (the
    * append is a parallel Spark write) — same exposure as the
    * reference; run loads per-key-batch under a scheduler that retries.
    *
    * PRECONDITION — the key column must be DIMENSION-GRADE. The
    * distinct key set crosses the driver (the collect below feeds the
    * parameterized deletes), so `keyCol` must be a partition-grade
    * value (county, date, tenant) whose cardinality is bounded by
    * design, never a data-sized id (custkey, event id): a data-sized
    * key set would both OOM the driver and issue millions of DELETEs.
    * The guard is enforced: more than `maxKeys` distinct keys aborts
    * the load BEFORE anything is collected in full or deleted. Raise
    * `maxKeys` explicitly (the escape hatch) only for a key you have
    * verified is bounded — if you find yourself raising it past ~1e6,
    * the key is not partition-grade and the right tool is
    * [[KeyedOverwriteSink]] on parquet or a staged MERGE. */
  object JdbcKeyedOverwrite {
    private val Ident = "^[A-Za-z_][A-Za-z0-9_.]*$".r

    /** Default cap on the distinct-key set (see precondition above). */
    val DefaultMaxKeys = 100000

    private[graft] def requireIdent(s: String): String = {
      require(Ident.matches(s), s"unsafe SQL identifier: $s")
      s
    }

    def write(df: DataFrame, url: String, table: String, keyCol: String,
        options: Map[String, String] = Map.empty,
        maxKeys: Int = DefaultMaxKeys): Unit = {
      requireIdent(table); requireIdent(keyCol)
      // one materialization: the key set collected here and the rows
      // appended below must come from the SAME evaluation, or a source
      // that changes between the two actions deletes a key set that
      // doesn't match the appended rows
      val pinned = df.persist()
      try {
        // limit(maxKeys+1) bounds the driver transfer BEFORE the guard
        // fires: a data-sized key column costs one truncated collect,
        // not an OOM
        val keys = pinned.select(keyCol).distinct()
          .limit(maxKeys + 1).collect().map(_.get(0))
        require(keys.length <= maxKeys,
          s"JdbcKeyedOverwrite: > $maxKeys distinct '$keyCol' keys — " +
            "not a dimension-grade key (see scaladoc; raise maxKeys only " +
            "for a verified-bounded key)")
        val conn = java.sql.DriverManager.getConnection(url,
          graft.sources.Jdbc.props(options))
        try {
          val exists = {
            // DatabaseMetaData needs exact case per-dialect; a probe
            // query is the portable existence check. ONLY a missing-
            // object error (SQLState class 42) means "skip the delete" —
            // a transient failure (lock timeout, dropped connection)
            // must abort the load, not silently skip to a duplicating
            // append
            val st = conn.createStatement()
            try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
            catch {
              case e: java.sql.SQLException
                  if e.getSQLState != null && e.getSQLState.startsWith("42") =>
                false
            }
            finally st.close()
          }
          if (exists && keys.nonEmpty) {
            conn.setAutoCommit(false)
            try {
              val nonNull = keys.filter(_ != null)
              if (nonNull.nonEmpty) {
                // Spark's JDBC writer creates columns as QUOTED
                // (case-exact) identifiers; an unquoted name would be
                // case-normalized by the database (Derby/Postgres
                // upcase) and miss the column. Prepared lazily: some
                // dialects reject '=' on large-object columns at
                // PREPARE time, and a null-only key set never needs it
                val ps = conn.prepareStatement(
                  s"""DELETE FROM $table WHERE "$keyCol" = ?""")
                try {
                  nonNull.foreach { k => ps.setObject(1, k); ps.addBatch() }
                  ps.executeBatch()
                } finally ps.close()
              }
              // '= NULL' matches nothing: null keys need their own form
              if (keys.contains(null)) {
                val st = conn.createStatement()
                try st.executeUpdate(s"""DELETE FROM $table WHERE "$keyCol" IS NULL""")
                finally st.close()
              }
              conn.commit()
            } catch {
              case e: Throwable => conn.rollback(); throw e
            }
          }
        } finally conn.close()
        pinned.write.mode(SaveMode.Append)
          .jdbc(url, table, graft.sources.Jdbc.props(options))
      } finally pinned.unpersist()
    }
  }

  /** Small-file compaction — the operational chore every incremental
    * 100 TB parquet table accumulates: streaming writers leave many
    * small files, and scan efficiency dies on file-open overhead.
    * Rewrites a dataset into ~`targetFileMB` files based on its actual
    * on-disk size. UNPARTITIONED datasets only (a partitioned layout
    * would be flattened — the method refuses). The swap is
    * rename-based: stage → retire old → promote staging → drop old;
    * a crash can leave the retired copy at `<path>.compact-old` but
    * never zero copies. */
  object Compaction {
    def compact(spark: org.apache.spark.sql.SparkSession, path: String,
        targetFileMB: Int = 128): Int = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path) // normalizes trailing '/'
      val fs = p.getFileSystem(conf) // the PATH's fs, not the default fs
      val partitioned = fs.listStatus(p)
        .exists(st => st.isDirectory && st.getPath.getName.contains("="))
      require(!partitioned,
        s"$path has partition directories; compaction would flatten the layout")
      val bytes = fs.getContentSummary(p).getLength
      val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt)
      // siblings of the dataset dir, never children
      val staging = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".compact-staging")
      val retired = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".compact-old")
      spark.read.parquet(p.toString).repartition(nFiles)
        .write.mode(SaveMode.Overwrite).parquet(staging.toString)
      fs.delete(retired, true)
      if (!fs.rename(p, retired))
        throw new java.io.IOException(s"compaction could not retire $p")
      if (!fs.rename(staging, p)) {
        fs.rename(retired, p) // roll back: restore the original
        throw new java.io.IOException(s"compaction rename failed for $path; original restored")
      }
      fs.delete(retired, true)
      nFiles
    }
  }

  /** CSV export — the reference's CSV COPY staging step
    * (district_gis_etl.py loads the crosswalk via CSV COPY). Parquet is
    * the engine-native format; this sink exists for interchange with
    * COPY-style consumers. `singleFile` coalesces to one file (COPY
    * wants one stream) — only for dimension-sized outputs, never facts. */
  object CsvSink {
    def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
      val out = if (singleFile) df.coalesce(1) else df
      out.write
        .mode(SaveMode.Overwrite)
        .option("header", "true")
        .csv(path)
    }
  }

  /** Range-sharded training-data export — the final step of a
    * pretraining pipeline: write the packed/curated corpus as N
    * key-ordered shards a downstream loader can consume independently,
    * plus a manifest describing each shard's key range.
    *
    * `repartitionByRange` samples the key to compute balanced range
    * boundaries (one shuffle), `sortWithinPartitions` orders every
    * shard internally, so the export is GLOBALLY sorted: shard i's keys
    * all precede shard i+1's. A loader can then stream shards in order,
    * range-prune by manifest, or assign shards to workers round-robin
    * with no coordination. The manifest is computed by re-reading what
    * was actually written (count + min/max key per shard) — it
    * describes the files on disk, not the plan that produced them.
    *
    * Boundary determinism: `repartitionByRange` samples the key with
    * `RangePartitioner`'s per-partition seeded reservoir (seed =
    * byteswap32 of the partition index), so re-running on IDENTICAL
    * input with the identical upstream partitioning reproduces the
    * same boundaries, shard assignment, and manifest bit-for-bit
    * (spec-asserted). If the upstream file layout changes (compaction,
    * different maxPartitionBytes), boundaries may shift — shard
    * membership is a layout-dependent artifact, only the GLOBAL order
    * and the manifest's faithfulness to disk are invariants. */
  object ShardedExport {
    def write(df: DataFrame, path: String, keyCol: String,
        nShards: Int): DataFrame = {
      df.repartitionByRange(nShards, col(keyCol))
        .sortWithinPartitions(col(keyCol))
        .withColumn("shard_id", org.apache.spark.sql.functions.spark_partition_id())
        .write.mode(SaveMode.Overwrite)
        .partitionBy("shard_id")
        .parquet(path)
      df.sparkSession.read.parquet(path)
        .groupBy("shard_id")
        .agg(count(lit(1)).as("rows"),
          min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"))
    }
  }

  object PartitionedParquet {
    /** Partition by `partitionCol`, cluster files on `sortCols`:
      * one shuffle to co-locate each partition's data, then an in-memory
      * sort per task so every file is internally ordered — parquet
      * min/max stats then let 100 TB scans skip non-matching row groups.
      */
    def write(df: DataFrame, path: String, partitionCol: String,
              sortCols: Seq[String], nShufflePartitions: Int = 0): Unit = {
      val repart =
        if (nShufflePartitions > 0) df.repartition(nShufflePartitions, col(partitionCol))
        else df.repartition(col(partitionCol))
      // partition col must lead the sort: the file writer requires its
      // input ordered by the partition columns and would otherwise insert
      // its own sort, destroying the secondary clustering
      repart
        .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
        .write
        .mode(SaveMode.Overwrite)
        .partitionBy(partitionCol)
        .parquet(path)
    }
  }
}
