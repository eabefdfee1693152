package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored EXACT additive-count table — the bounded-frame companion of
  * the sketch-table lifecycles for the operators whose state is
  * already tiny: per-(type, day) event volumes (types × days rows),
  * per-(day, src, dst) transition counts (days × alphabet²). Counts
  * are additive, so the append is a SUM merge — and like the
  * frequency tier (whose additivity shares the replay hazard) every
  * row carries a `last_batch` stamp committed in the SAME
  * generation-flip as the merged counts: a replayed `foreachBatch`
  * at-or-below the stamp no-ops, making ingest exactly-once under
  * at-least-once delivery ([[Sketches.appendToFreqTable]]'s
  * contract).
  *
  * Layout: `<name>_counts` (groupCols ++ cnt ++ last_batch), bucketed
  * on `groupCols.head` so the append's merge groupBy reads the stored
  * side shuffle-free, plus `<name>_meta`. The table is the
  * AGGREGATED frame — callers aggregate their batch before appending;
  * the count column is summed.
  */
object CountTable {

  private def refresh(spark: SparkSession, name: String): Unit =
    StoredTable.refresh(spark, s"${name}_counts", s"${name}_meta")

  /** Create/overwrite the stored table from an already-aggregated
    * counts frame (groupCols ++ one or more additive sum columns).
    */
  def write(spark: SparkSession, name: String, counts: DataFrame,
            groupCols: Seq[String], sumCols: Seq[String], buckets: Int = 16): Unit = {
    require(sumCols.nonEmpty, "a count table needs at least one sum column")
    StoredTable.writeStamped(
      counts.select(groupCols.map(col) ++
        sumCols.map(c => col(c).cast("long").as(c)): _*),
      s"${name}_counts", groupCols.head, buckets)
    import spark.implicits._
    Seq((groupCols, sumCols, buckets))
      .toDF("group_cols", "sum_cols", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  /** Single-sum-column convenience. */
  def write(spark: SparkSession, name: String, counts: DataFrame,
            groupCols: Seq[String], countCol: String, buckets: Int): Unit =
    write(spark, name, counts, groupCols, Seq(countCol), buckets)
  def write(spark: SparkSession, name: String, counts: DataFrame,
            groupCols: Seq[String], countCol: String): Unit =
    write(spark, name, counts, groupCols, Seq(countCol), 16)

  private def meta(spark: SparkSession, name: String): (Seq[String], Seq[String], Int) = {
    val r = StoredTable.metaRow(spark, name, "count")
    (StoredTable.metaGroupCols(r), StoredTable.metaGroupCols(r, "sum_cols"),
      r.getAs[Int]("buckets"))
  }

  /** Sum one aggregated batch in. With `batchId >= 0` a replay
    * at-or-below the stored stamp no-ops (exactly-once; ids must be
    * monotone — the foreachBatch contract). `batchId = -1` skips the
    * guard for ad-hoc appends.
    */
  def append(spark: SparkSession, name: String, batchCounts: DataFrame,
             batchId: Long = -1L): Unit = {
    refresh(spark, name)
    val (groupCols, sumCols, buckets) = meta(spark, name)
    val batchFrame = batchCounts
      .select(groupCols.map(col) ++ sumCols.map(c => col(c).cast("long").as(c)): _*)
    StoredTable.appendStamped(spark, s"${name}_counts", Seq(groupCols.head), buckets, batchId) {
      stored => stored.unionByName(batchFrame)
        .groupBy(groupCols.map(col): _*)
        .agg(sumCols.map(c => sum(col(c)).as(c)).head,
          sumCols.map(c => sum(col(c)).as(c)).tail: _*)
    }
    ()
  }

  /** The stored counts (groupCols ++ the original sum column names)
    * — zero raw data touched.
    */
  def read(spark: SparkSession, name: String): DataFrame = {
    refresh(spark, name)
    val (groupCols, sumCols, _) = meta(spark, name)
    spark.table(s"${name}_counts")
      .select((groupCols ++ sumCols).map(col): _*)
  }
}
