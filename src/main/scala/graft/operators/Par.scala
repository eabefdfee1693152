package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row operators.
  *
  * A small parquet file scans as ONE partition (files under
  * maxPartitionBytes don't split), so an expensive narrow pipeline on
  * top of it — minhash signatures, simhash votes, a broadcast-join
  * pair expansion — runs on one core no matter how many the cluster
  * has. `spread` repartitions ONLY when the scan has fewer partitions
  * than the session's parallelism: a no-op on real multi-file /
  * 100 TB inputs (they already have thousands of splits), a 32×
  * unlock on the single-file bench tables.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
