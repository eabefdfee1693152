package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output-side plumbing: how graft results land on distributed
  * storage so DOWNSTREAM readers scan less.
  *
  *  - `writePartitioned`: hive-style directory partitioning — readers
  *    filtering on the partition column prune whole directories
  *    (PartitionFilters in their scan, zero data read for pruned
  *    values). Right for low-cardinality routing keys (lang, date,
  *    source).
  *  - `writeBucketed`: hash-bucketed + sorted table — a downstream
  *    join or groupBy on the bucket key skips its shuffle entirely
  *    (bucketed scan reports the hash partitioning to Catalyst).
  *    Right for high-cardinality join keys (doc_id, user_id).
  *
  * At 100 TB the partition/bucket choice IS the query plan of every
  * later consumer; these helpers make the two canonical layouts
  * one-liners.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Append one per-batch centroid snapshot — the reference engine's
    * cluster-visualization feed (flink-streaming-kmeans exposes
    * periodic cluster snapshots for its map UI) as a durable,
    * queryable table instead of stdout. Partitioned by batch_id:
    * a monitoring reader of "the latest snapshot" prunes every other
    * partition; history accumulates append-only for time-travel
    * plots. Each snapshot is k rows — writer cost is O(k), never
    * data-sized.
    */
  def writeSnapshot(spark: SparkSession, path: String, batchId: Long,
                    centroids: Seq[(Long, Array[Double])],
                    weights: Map[Long, Double] = Map.empty): Unit = {
    import spark.implicits._
    centroids.map { case (cid, c) => (batchId, cid, c.toSeq, weights.getOrElse(cid, 0.0)) }
      .toDF("batch_id", "cid", "centroid", "weight")
      .coalesce(1).write.mode(SaveMode.Append).partitionBy("batch_id").parquet(path)
  }

  /** Read a snapshot dir back (all batches; filter batch_id to prune). */
  def readSnapshots(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Append one micro-batch of per-point cluster assignments — the
    * reference engine's other streaming output (each point labeled with
    * the cluster it joined). Unlike snapshots this IS data-sized, so it
    * keeps the batch's own partitioning (no coalesce) and relies on
    * batch_id directory pruning for "what did batch N assign" reads;
    * a consumer joining assignments to points prunes by batch range
    * first. Exactly-once per batch comes from the streaming engine's
    * batch-id-keyed retry (rerun batches overwrite their own dir).
    */
  def writeAssignments(batchId: Long, assigned: DataFrame, path: String): Unit =
    assigned.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/batch_id=$batchId")

  /** Read an assignments dir back; `batch_id` comes from the directory
    * name (hive-style), so filters on it prune whole batches.
    */
  def readAssignments(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** Bucketed tables require the metastore path (saveAsTable); the
    * session's warehouse dir decides physical placement.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    writeBucketed(df, table, Seq(bucketCol), buckets, mode)

  /** Multi-column bucketing: a downstream join/groupBy on EXACTLY
    * these columns (e.g. an LSH candidate join on (band, bucket))
    * reads the hash partitioning from the table layout and skips its
    * shuffle — same contract as the single-column form.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int,
                    mode: SaveMode): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Rewrite a bucketed table so each bucket is ONE file again — the
    * maintenance pass for append-accumulated small files, with ZERO
    * shuffle: forcing the bucketed scan (autoBucketedScan off for the
    * rewrite) reads each bucket's files as ONE task, and the bucketed
    * writer then emits exactly one file per bucket. The explicit
    * `repartition` (same murmur3 `hash pmod buckets` routing as
    * bucketing) is belt-and-braces: redundant over the aligned scan —
    * Catalyst elides it — but it keeps the write correct if a future
    * planner declines the bucketed read. (Without BOTH, the default
    * planner removes the repartition as satisfied-by-bucketing and
    * THEN un-buckets the scan — `DisableUnnecessaryBucketedScan` —
    * leaving misaligned tasks that re-fragment every bucket; probed
    * on Spark 4.1.)
    *
    * Swap is a versioned-location POINTER FLIP (see
    * [[flipToGeneration]]) — a concurrent reader always resolves a
    * live table (spec-pinned under a hammering reader thread).
    */
  def compactBucketed(spark: SparkSession, table: String, bucketCols: Seq[String],
                      buckets: Int): Unit =
    rewriteBucketed(spark, table, bucketCols, buckets, identity)

  /** The general in-place bucketed rewrite behind [[compactBucketed]]:
    * scan the table bucket-aligned, apply `transform` (which must
    * PRESERVE the hash partitioning — a broadcast anti-join or a
    * filter does; a shuffle-inducing transform would re-fragment the
    * layout), and write each bucket back as one file. This is how a
    * plain-parquet metastore expresses row-level maintenance — the
    * compaction pass (identity transform) and the retraction pass
    * (anti-join against a bounded delete set) are the same rewrite.
    *
    * The new generation is written to a versioned location as an
    * EXTERNAL staging table, then the live table FLIPS to it with one
    * `ALTER TABLE SET LOCATION` — never dropped, never renamed, so a
    * concurrent reader resolving the table by name always finds it
    * (the r9 drop→rename swap had a missing-table window). See
    * [[flipToGeneration]] for the residual race and the writer
    * contract.
    */
  def rewriteBucketed(spark: SparkSession, table: String, bucketCols: Seq[String],
                      buckets: Int, transform: DataFrame => DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoKey)
    spark.conf.set(autoKey, "false")
    try {
      val tmp = s"${table}__compact"
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      val (oldLoc, newLoc) = nextGenLocation(spark, table)
      transform(spark.table(table)).repartition(buckets, bucketCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .format("parquet").option("path", newLoc)
        .saveAsTable(tmp)
      flipToGeneration(spark, table, tmp, oldLoc, newLoc)
    } finally spark.conf.set(autoKey, prev)
  }

  /** (current location, next generation's location) for a maintenance
    * rewrite: generations are sibling directories `<base>__gN` so the
    * live directory is never written into nor renamed away.
    */
  private[graft] def nextGenLocation(spark: SparkSession, table: String)
  : (java.net.URI, String) = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = spark.sessionState.catalog.getTableMetadata(ident).location
    val s = loc.toString.stripSuffix("/")
    val i = s.lastIndexOf("__g")
    val (base, gen) =
      if (i > 0 && s.length > i + 3 && s.drop(i + 3).forall(_.isDigit))
        (s.take(i), s.drop(i + 3).toLong + 1)
      else (s, 1L)
    (loc, s"${base}__g$gen")
  }

  /** The maintenance-swap commit: point the live table at the staged
    * generation with ONE catalog operation (`ALTER TABLE SET
    * LOCATION`), drop the external staging entry (metadata only — an
    * external drop never touches data), and delete the previous
    * generation's directory. A reader resolving the table BY NAME at
    * any instant finds a live table over a complete generation — the
    * catalog-level missing-table window of a drop→rename swap cannot
    * occur. Residual race, documented: a reader that planned file
    * handles against the OLD generation and is still mid-scan when
    * its directory deletes will fail that scan — eliminating that too
    * needs snapshot-isolated retention (keep N generations, vacuum
    * later) or a transactional table format; single-WRITER ownership
    * of maintenance passes remains the contract either way.
    */
  private[graft] def flipToGeneration(spark: SparkSession, table: String, stagingTable: String,
                                      oldLoc: java.net.URI, newLoc: String): Unit = {
    spark.sql(s"ALTER TABLE $table SET LOCATION '$newLoc'")
    flipCleanup(spark, stagingTable, oldLoc)
  }

  /** The flip's second half, separated so partitioned tables can run
    * their `MSCK REPAIR` between the location flip and the old
    * generation's deletion (readers on stale partition entries read
    * the old snapshot until the repair lands).
    */
  private[graft] def flipCleanup(spark: SparkSession, stagingTable: String,
                                 oldLoc: java.net.URI): Unit = {
    spark.sql(s"DROP TABLE $stagingTable")
    val p = new org.apache.hadoop.fs.Path(oldLoc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
