package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Parallelism guard for compute-heavy per-row operators.
  *
  * A small parquet file scans as ONE partition (files under
  * maxPartitionBytes don't split, and a single row group can't be
  * read in parallel anyway), so an expensive narrow pipeline on top
  * of it — minhash signatures, simhash votes, a broadcast-join pair
  * expansion — runs on one core no matter how many the cluster has.
  * `spread` repartitions ONLY when the scan is estimated to produce
  * fewer splits than the session's parallelism: a no-op on real
  * multi-file / 100 TB inputs (they already have thousands of
  * splits), a 32× unlock on the single-file bench tables.
  *
  * The split estimate comes from the relation's (cached) file index —
  * file count + total bytes over maxPartitionBytes — NOT from
  * `df.rdd.getNumPartitions`, which would eagerly run physical
  * planning and build the RDD lineage on the driver for every
  * operator invocation. Frames with no file scan underneath (in-memory
  * test data, already-shuffled inputs) are left untouched.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxBytes = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    // Split estimate over scans NOT already covered by a caller
    // repartition: a subtree under a SHUFFLING repartition is parallel
    // by construction (its scans don't need — and must not get —
    // another exchange), but a repartition on ONE join leg says
    // nothing about the other leg's single-file scan, so coverage is
    // decided per ancestor chain, not plan-globally. Only shuffling
    // repartitions cover: coalesce() builds the same Repartition node
    // with shuffle=false and NARROWS parallelism — exactly the case
    // spread must still fix.
    def uncoveredSplits(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Long =
      plan match {
        case r: org.apache.spark.sql.catalyst.plans.logical.Repartition if r.shuffle => 0L
        case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => 0L
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation =>
            fs.location.inputFiles.length.toLong + fs.location.sizeInBytes / maxBytes
          case _ => target.toLong // non-file relation: assume parallel enough
        }
        case p => p.children.map(uncoveredSplits).sum
      }
    val estSplits = uncoveredSplits(df.queryExecution.analyzed)
    if (estSplits > 0 && estSplits < target) df.repartition(target) else df
  }
}
