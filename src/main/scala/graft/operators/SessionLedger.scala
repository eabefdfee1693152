package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The session-tier ledger: per-session analytic rows (the
  * [[graft.streaming.StreamingSessionPaths.SessionPathOut]] shape)
  * rolled into three bounded [[CountTable]] stores — per-day funnel
  * depth counts, the (day, path) histogram, the (day, src, dst)
  * transition matrix — so ALL session dashboards answer any day range
  * with zero event-history rescans.
  *
  * Two producers, one ledger:
  *  - BATCH: [[sessionRows]] computes the per-session frame from raw
  *    events with the exact conventions of [[Funnel.sessionDaily]] /
  *    [[PathAnalysis.topkSession]] / [[PathAnalysis.transitionsSession]]
  *    (second-truncated gap sessions over ALL events, (ts_s, event_id)
  *    path order, the greedy (t, si) depth fold, start-day
  *    attribution);
  *  - STREAMING: [[graft.streaming.StreamingSessionPaths]] emits the
  *    same rows watermark-finally; route them through `foreachBatch`
  *    → [[appendBatch]] with the batch id and ingest is exactly-once
  *    under replays (the CountTable stamp).
  *
  * Sessions are additive ledger units: every session's row is
  * computed from its complete event set, so disjoint session batches
  * just sum (the same argument as the attribution credit ledger).
  * Spec-pinned: batch sessionRows ≡ the streaming twin on a replayed
  * stream, each reader ≡ its direct operator, replays no-op.
  */
object SessionLedger {

  /** Per-session analytic rows from raw events (`user_id`,
    * `session_id`, `d`, `n_events`, `path`, `depth`, `edges`) — one
    * (user) shuffle via sessionize, one (user, session) aggregation
    * building all analytics in a single pass.
    */
  def sessionRows(events: DataFrame, gapSeconds: Long = 1800L,
                  steps: Seq[String] = Seq("view", "click", "purchase"),
                  maxSteps: Int = 5): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val se = Sessionize.withSessionIds(events, gapSeconds)
    val sorted = array_sort(collect_list(
      struct(col("ts_s"), col("event_id"), col("event_type"))))
    val types = transform(sorted, e => e.getField("event_type"))
    // greedy fold over (t, si) like Funnel: collect_list skips the
    // null non-step rows, array_sort orders by (t, si) — same-second
    // events fold in step order
    val stepEvents = array_sort(collect_list(
      when(Funnel.stepIndex(steps) >= 0,
        struct(col("ts_s"), Funnel.stepIndex(steps).as("si")))))
    val depth = aggregate(stepEvents, lit(0),
      (acc, e) => when(e.getField("si") === acc, acc + 1).otherwise(acc))
    def edgesOf(t: Column): Column =
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("src_step"), b.as("dst_step")))
    se.groupBy(col("user_id"), col("session_id"))
      .agg(expr("(min(ts_s) div 86400) * 86400").as("d"),
        count(lit(1)).as("n_events"),
        array_join(slice(types, 1, maxSteps), ">").as("path"),
        depth.as("depth"),
        edgesOf(types).as("edges"))
  }

  // ---- rollups (the foreachBatch bodies) --------------------------------

  /** (d, n_step1..n) — sessions at each funnel depth. */
  def rollupDepths(batch: DataFrame, nSteps: Int): DataFrame = {
    val counts = (1 to nSteps).map(i =>
      sum(when(col("depth") >= i, 1L).otherwise(0L)).as(s"n_step$i"))
    batch.groupBy(col("d")).agg(counts.head, counts.tail: _*)
  }

  /** (d, path, n_sessions). */
  def rollupPaths(batch: DataFrame): DataFrame =
    batch.groupBy(col("d"), col("path")).agg(count(lit(1)).as("n_sessions"))

  /** (d, src_step, dst_step, n_trans). */
  def rollupEdges(batch: DataFrame): DataFrame =
    batch.select(col("d"), explode(col("edges")).as("e"))
      .groupBy(col("d"), col("e.src_step").as("src_step"),
        col("e.dst_step").as("dst_step"))
      .agg(count(lit(1)).as("n_trans"))

  // ---- stored lifecycle --------------------------------------------------

  /** Create the three ledger tables from an initial per-session frame
    * (possibly empty — a pure-streaming ledger starts from
    * `sessionRows(emptyEvents)`).
    */
  def writeTables(spark: SparkSession, name: String, sessions: DataFrame,
                  nSteps: Int = 3, buckets: Int = 16): Unit = {
    writeFunnelTable(spark, name, sessions, nSteps, buckets)
    writePathsTable(spark, name, sessions, buckets)
    writeEdgesTable(spark, name, sessions, buckets)
  }

  /** Single-table creators — for a dashboard that only needs one
    * rollup; [[appendBatch]] then stamps whichever of the three
    * tables exist (catalog-checked), so a funnel-only ledger takes
    * appends without the other two.
    */
  def writeFunnelTable(spark: SparkSession, name: String, sessions: DataFrame,
                       nSteps: Int = 3, buckets: Int = 16): Unit =
    CountTable.write(spark, s"${name}_funnel", rollupDepths(sessions, nSteps),
      Seq("d"), (1 to nSteps).map(i => s"n_step$i"), buckets)

  def writePathsTable(spark: SparkSession, name: String, sessions: DataFrame,
                      buckets: Int = 16): Unit =
    CountTable.write(spark, s"${name}_paths", rollupPaths(sessions),
      Seq("d", "path"), Seq("n_sessions"), buckets)

  def writeEdgesTable(spark: SparkSession, name: String, sessions: DataFrame,
                      buckets: Int = 16): Unit =
    CountTable.write(spark, s"${name}_edges", rollupEdges(sessions),
      Seq("d", "src_step", "dst_step"), Seq("n_trans"), buckets)

  /** Fold one batch of per-session rows into whichever ledger tables
    * exist — the `foreachBatch` body for a
    * [[graft.streaming.StreamingSessionPaths]] sink (exactly-once via
    * each table's batch stamp). A single-table ledger (one of the
    * `write*Table` creators alone) takes appends to just that table.
    */
  def appendBatch(spark: SparkSession, name: String, sessions: DataFrame,
                  batchId: Long = -1L): Unit = {
    def has(suffix: String) = spark.catalog.tableExists(s"${name}_${suffix}_meta")
    require(has("funnel") || has("paths") || has("edges"),
      s"session ledger $name: no ledger tables exist")
    if (has("funnel")) {
      val nSteps = CountTable.read(spark, s"${name}_funnel").columns.length - 1
      CountTable.append(spark, s"${name}_funnel", rollupDepths(sessions, nSteps), batchId)
    }
    if (has("paths"))
      CountTable.append(spark, s"${name}_paths", rollupPaths(sessions), batchId)
    if (has("edges"))
      CountTable.append(spark, s"${name}_edges", rollupEdges(sessions), batchId)
  }

  /** ≡ [[Funnel.sessionDaily]] from the stored ledger alone. */
  def funnelDaily(spark: SparkSession, name: String): DataFrame =
    CountTable.read(spark, s"${name}_funnel")
      .filter(col("n_step1") > 0)
      .orderBy(col("d"))

  /** ≡ [[PathAnalysis.topkSession]] from the stored histogram — the
    * rank runs over the bounded (day, path) frame.
    */
  def topkPaths(spark: SparkSession, name: String, k: Int = 5): DataFrame = {
    val byDay = Window.partitionBy(col("d"))
      .orderBy(col("n_sessions").desc, col("path"))
    CountTable.read(spark, s"${name}_paths")
      .withColumn("rk", row_number().over(byDay))
      .filter(col("rk") <= k)
      .select(col("d"), col("path"), col("n_sessions"))
      .orderBy(col("d"), col("n_sessions").desc, col("path"))
  }

  /** ≡ [[PathAnalysis.transitionsSession]] from the stored matrix. */
  def transitions(spark: SparkSession, name: String): DataFrame =
    CountTable.read(spark, s"${name}_edges")
      .orderBy(col("d"), col("src_step"), col("dst_step"))
}
