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
    * Swap is write-tmp → drop → rename: not atomic — callers own
    * single-writer maintenance windows.
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
    * Swap is write-tmp → drop → rename: not atomic — callers own
    * single-writer maintenance windows.
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
      writeBucketed(
        transform(spark.table(table)).repartition(buckets, bucketCols.map(col): _*),
        tmp, bucketCols, buckets, SaveMode.Overwrite)
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    } finally spark.conf.set(autoKey, prev)
  }
}
