package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

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
