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

  /** Bucketed tables require the metastore path (saveAsTable); the
    * session's warehouse dir decides physical placement.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
