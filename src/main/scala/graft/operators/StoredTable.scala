package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** The machinery every stored lifecycle shares — HLL / frequency /
  * quantile / theta sketch tables ([[Sketches]]) and the exact
  * additive [[CountTable]] all persist as `<name>_<rows>` (bucketed on
  * the leading group column) plus a one-row `<name>_meta`, fold
  * batches in with a generation-flip rewrite ([[Sinks.rewriteBucketed]]
  * — readers stay live), and differ ONLY in their merge aggregate and
  * meta geometry. Centralized here so a new stored operator writes its
  * aggregate and its meta row and inherits the rest; the two append
  * skeletons encode the tier's two replay postures:
  *
  *   - ADDITIVE state (counts, frequency sketches, GK summaries)
  *     double-counts on redelivery → [[appendStamped]]: every row
  *     carries `last_batch`, the stamp commits in the SAME atomic
  *     location flip as the merged rows, and a batch at-or-below the
  *     stored stamp no-ops — exactly-once under foreachBatch's
  *     at-least-once contract (ids must be monotone).
  *   - INSERTION-IDEMPOTENT state (HLL, theta) absorbs replays for
  *     free → the plain merge rewrite, no bookkeeping.
  */
private[operators] object StoredTable {

  /** A stored table may have been rewritten (append's generation
    * flip, or a rebuild) since THIS session — or a streaming
    * micro-batch's session clone — last listed it: a stale listing
    * reads a flipped-away generation. Refresh (metadata-only) before
    * any stored read — the ExactIndex staleness lesson.
    */
  def refresh(spark: SparkSession, tables: String*): Unit =
    tables.foreach(spark.catalog.refreshTable)

  /** The exactly-one-row meta guard — positional/odd-row meta would
    * miswire geometry silently.
    */
  def metaRow(spark: SparkSession, name: String, what: String): Row = {
    val rows = spark.table(s"${name}_meta").collect()
    require(rows.length == 1, s"$what table $name: corrupt meta (${rows.length} rows)")
    rows(0)
  }

  /** `group_cols` travels as array<string> since r13; tables written
    * by earlier binaries stored a comma-joined string. Read either —
    * a raw ClassCastException on a legacy meta row would force a
    * needless stored-table rebuild (column names can't contain ','
    * under the legacy writer, so the split is lossless).
    */
  def metaGroupCols(r: Row, field: String = "group_cols"): Seq[String] =
    r.schema(field).dataType match {
      case org.apache.spark.sql.types.StringType =>
        // "".split(",") is Seq(""), not Seq.empty — a legacy GLOBAL
        // (no-group-column) sketch must not resolve to a phantom
        // empty-named column
        val s = r.getAs[String](field)
        if (s.isEmpty) Seq.empty else s.split(",").toSeq
      case _ => r.getAs[scala.collection.Seq[String]](field).toSeq
    }

  /** Highest ingest batch id folded in so far (−1 = none). */
  def appliedStamp(spark: SparkSession, table: String): Long =
    spark.table(table)
      .agg(coalesce(max(col("last_batch")), lit(-1L))).collect()(0).getLong(0)

  /** Initial write of an additive lifecycle's row table: the
    * aggregated rows, stamped "no batch yet", bucketed on the leading
    * group column.
    */
  def writeStamped(rows: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    // create-or-replace: a table that has generation-flipped (any
    // stamped append rewrites) no longer accepts a plain Overwrite at
    // its base location — the writeThetaTable lesson, applied to the
    // whole stamped tier
    Sinks.replaceBucketed(rows.sparkSession, rows.withColumn("last_batch", lit(-1L)),
      table, Seq(bucketCol), buckets)

  /** The additive append skeleton: replay-guard on the stored stamp,
    * then ONE generation-flip rewrite committing the merged rows and
    * the new stamp atomically. `merge` sees the stored rows WITHOUT
    * `last_batch` and returns merged rows without it. Returns false
    * iff the batch was a guarded replay (no-op). Callers refresh
    * before reading their meta.
    */
  def appendStamped(spark: SparkSession, table: String, bucketCols: Seq[String],
                    buckets: Int, batchId: Long)(merge: DataFrame => DataFrame): Boolean = {
    val applied = appliedStamp(spark, table)
    if (batchId >= 0 && batchId <= applied) return false
    val stamp = if (batchId >= 0) batchId else applied
    Sinks.rewriteBucketed(spark, table, bucketCols, buckets,
      stored => merge(stored.drop("last_batch")).withColumn("last_batch", lit(stamp)))
    true
  }
}
