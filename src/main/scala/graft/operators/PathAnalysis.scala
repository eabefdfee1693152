package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey path analysis: the ordered sequence of event types a
  * user produced within a grain (day), truncated to its first
  * `maxSteps` steps and ranked by how many users shared it — the
  * sankey/flow question ("what do users actually do?") that
  * complements the funnel's fixed-chain question.
  *
  * Plan shape: ONE shuffle to (day, user) builds each user-day's
  * time-sorted type sequence (bounded by per-user-per-day event
  * volume — the sessionize/funnel assumption), a map-side slice +
  * join truncates it to `maxSteps`, then a partial-agg count to
  * (day, path) and a top-k per day through the rank window —
  * Spark's WindowGroupLimit pushes the per-partition k-cap below the
  * rank exchange, so the final shuffle carries at most k rows per
  * input partition per day, not the full path histogram. Ties break
  * on the path string, total and engine-portable. Truncation is what
  * keeps the path alphabet analytically useful (and the row width
  * bounded) at any event volume; same-timestamp events order by type
  * name on both sides.
  */
object PathAnalysis {

  /** Per-day top-`k` `maxSteps`-step journey paths over the events
    * table. Output: `d`, `path` ("view>click>…"), `n_users`, ordered
    * by (d, n_users desc, path).
    */
  def topkDaily(spark: SparkSession, dir: String,
                k: Int = 5, maxSteps: Int = 5): DataFrame =
    topkDaily(graft.Tables.events(spark, dir), k, maxSteps)

  /** The same computation over any frame with `user_id`, `ts`,
    * `event_type` — the composition/rehearsal form.
    */
  def topkDaily(events: DataFrame, k: Int, maxSteps: Int): DataFrame =
    rankPaths(pathCounts(events, maxSteps), k)

  /** The full UNRANKED (d, path, n_users) histogram — additive over
    * whole (day, user) event groups, the stored lifecycle's batch
    * unit.
    */
  def pathCounts(events: DataFrame, maxSteps: Int = 5): DataFrame = {
    val ev = events
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"),
        col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_type"))
    val seq0 = array_sort(collect_list(struct(col("t"), col("event_type"))))
    val path = array_join(
      slice(transform(seq0, e => e.getField("event_type")), 1, maxSteps), ">")
    ev.groupBy(col("d"), col("user_id"))
      .agg(path.as("path"))
      .groupBy(col("d"), col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  private def rankPaths(counts: DataFrame, k: Int): DataFrame = {
    val byDay = Window.partitionBy(col("d"))
      .orderBy(col("n_users").desc, col("path"))
    counts
      .withColumn("rk", row_number().over(byDay))
      .filter(col("rk") <= k)
      .select(col("d"), col("path"), col("n_users"))
      .orderBy(col("d"), col("n_users").desc, col("path"))
  }

  // ---- stored day-grain path histogram -----------------------------------

  /** The (d, path, n_users) histogram in the exact additive
    * [[CountTable]] lifecycle: top-k over any day range answers from
    * the bounded stored frame. Append batches carry WHOLE (day, user)
    * groups (the path is a fold within that grain — the daily-load
    * unit); `batchId` stamps replays away.
    */
  def writePathsTable(spark: SparkSession, name: String, events: DataFrame,
                      maxSteps: Int = 5, buckets: Int = 16): Unit =
    CountTable.write(spark, name, pathCounts(events, maxSteps),
      Seq("d", "path"), Seq("n_users"), buckets)

  def appendToPathsTable(spark: SparkSession, name: String, batch: DataFrame,
                         maxSteps: Int = 5, batchId: Long = -1L): Unit =
    CountTable.append(spark, name, pathCounts(batch, maxSteps), batchId)

  /** [[topkDaily]] answered from the STORED histogram alone. */
  def topkFromTable(spark: SparkSession, name: String, k: Int = 5): DataFrame =
    rankPaths(CountTable.read(spark, name), k)

  /** Per-day Markov transition matrix: how often step type A was
    * IMMEDIATELY followed by step type B within a user's day — the
    * edge weights behind the sankey whose top whole paths
    * [[topkDaily]] ranks (the histogram answers "what do users do
    * NEXT from here", which truncated path strings can't). One
    * window shuffle to (day, user) orders each user-day (same
    * (t, event_type) tie order as the path sort), `lead` pairs each
    * event with its successor in place — no per-user sequence
    * materializes — then a partial-agg count reduces to the bounded
    * (day, src, dst) frame: at most days × |alphabet|² rows at any
    * event volume. Output: `d`, `src_step`, `dst_step`, `n_trans`,
    * ordered by all four.
    */
  def transitionsDaily(spark: SparkSession, dir: String): DataFrame =
    transitionsDaily(graft.Tables.events(spark, dir))

  /** The same computation over any frame with `user_id`, `ts`,
    * `event_type`.
    */
  def transitionsDaily(events: DataFrame): DataFrame = {
    val ev = events
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"),
        col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_type"))
    val byUD = Window.partitionBy(col("d"), col("user_id"))
      .orderBy(col("t"), col("event_type"))
    ev.withColumn("dst_step", lead(col("event_type"), 1).over(byUD))
      .filter(col("dst_step").isNotNull)
      .select(col("d"), col("event_type").as("src_step"), col("dst_step"))
      .groupBy(col("d"), col("src_step"), col("dst_step"))
      .agg(count(lit(1)).as("n_trans"))
      .orderBy(col("d"), col("src_step"), col("dst_step"))
  }

  // ---- stored transitions lifecycle ------------------------------------

  /** Persist the (d, src_step, dst_step, n_trans) matrix in the exact
    * additive [[CountTable]] lifecycle — days × alphabet² rows at any
    * event volume, so the sankey answers any day range (or the
    * all-time matrix, one groupBy on the tiny stored frame) with zero
    * raw-history rescans. CONTRACT: because adjacency is a window
    * within (day, user), an append batch must carry WHOLE (day, user)
    * event groups — the natural daily-load unit; a user-day split
    * across two batches would miss its boundary edge (the streaming
    * twin [[graft.streaming.StreamingSessionPaths]] handles arbitrary
    * arrival order with state instead). `batchId` gives replayed
    * deliveries the exactly-once guard.
    */
  def writeTransitionsTable(spark: SparkSession, name: String, events: DataFrame,
                            buckets: Int = 16): Unit =
    CountTable.write(spark, name, transitionsDaily(events),
      Seq("d", "src_step", "dst_step"), "n_trans", buckets)

  def appendToTransitionsTable(spark: SparkSession, name: String, batch: DataFrame,
                               batchId: Long = -1L): Unit =
    CountTable.append(spark, name, transitionsDaily(batch), batchId)

  /** [[transitionsDaily]] answered from the STORED counts alone. */
  def transitionsFromTable(spark: SparkSession, name: String): DataFrame =
    CountTable.read(spark, name)
      .orderBy(col("d"), col("src_step"), col("dst_step"))

  /** SESSION-grain top-k paths: the journey is one gap-session's
    * ordered type sequence, not a calendar day's — "what do visits
    * look like", the grain product analytics defaults to (the
    * [[Funnel.sessionDaily]] composition applied to the sankey
    * question). Sessions come from [[Sessionize.withSessionIds]]
    * over ALL events; each session's path is its first `maxSteps`
    * types in (ts_s, event_id) order (the sessionize ordering — total
    * because event_id is, so tie handling is engine-portable), counts
    * are SESSIONS sharing the path, and a session reports on the day
    * of its FIRST event. Plan: the sessionize window shuffle on user
    * + one (user, session) aggregation building path and start day
    * together — two data-sized exchanges — then the same bounded
    * (day, path) count and WindowGroupLimit-capped rank as
    * [[topkDaily]]. Output: `d`, `path`, `n_sessions`, ordered by
    * (d, n_sessions desc, path).
    */
  def topkSession(spark: SparkSession, dir: String, gapSeconds: Long = 1800L,
                  k: Int = 5, maxSteps: Int = 5): DataFrame =
    topkSession(graft.Tables.events(spark, dir), gapSeconds, k, maxSteps)

  /** The same computation over any frame with `user_id`, `event_id`,
    * `ts`, `event_type`.
    */
  def topkSession(events: DataFrame, gapSeconds: Long, k: Int, maxSteps: Int): DataFrame = {
    val se = Sessionize.withSessionIds(events, gapSeconds)
    val seq0 = array_sort(collect_list(
      struct(col("ts_s"), col("event_id"), col("event_type"))))
    val path = array_join(
      slice(transform(seq0, e => e.getField("event_type")), 1, maxSteps), ">")
    val byDay = Window.partitionBy(col("d"))
      .orderBy(col("n_sessions").desc, col("path"))
    se.groupBy(col("user_id"), col("session_id"))
      .agg(path.as("path"), expr("(min(ts_s) div 86400) * 86400").as("d"))
      .groupBy(col("d"), col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .withColumn("rk", row_number().over(byDay))
      .filter(col("rk") <= k)
      .select(col("d"), col("path"), col("n_sessions"))
      .orderBy(col("d"), col("n_sessions").desc, col("path"))
  }

  /** SESSION-grain transition matrix: adjacency is within one
    * gap-session (a morning view does NOT feed an evening click the
    * way the day grain says it does), `lead` pairing each event with
    * its successor in (ts_s, event_id) session order; all of a
    * session's edges report on its FIRST event's day, matching
    * [[Funnel.sessionDaily]] / [[topkSession]]. The sessionize
    * hashpartitioning(user) SATISFIES the (user, session) windows'
    * clustering, so the lead window and the session-start min only
    * re-sort — the whole pipeline rides ONE event-set shuffle
    * (spec plan-pinned: zero session exchanges); terminal events
    * (null lead) drop; the count reduces to the bounded
    * days × alphabet² frame. Output: `d`, `src_step`, `dst_step`,
    * `n_trans`, ordered by all four.
    */
  def transitionsSession(spark: SparkSession, dir: String,
                         gapSeconds: Long = 1800L): DataFrame =
    transitionsSession(graft.Tables.events(spark, dir), gapSeconds)

  /** The same computation over any frame with `user_id`, `event_id`,
    * `ts`, `event_type`.
    */
  def transitionsSession(events: DataFrame, gapSeconds: Long): DataFrame = {
    val se = Sessionize.withSessionIds(events, gapSeconds)
    val ordered = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val whole = Window.partitionBy(col("user_id"), col("session_id"))
    se.withColumn("dst_step", lead(col("event_type"), 1).over(ordered))
      .withColumn("start_s", min(col("ts_s")).over(whole))
      .filter(col("dst_step").isNotNull)
      .select(expr("(start_s div 86400) * 86400").as("d"),
        col("event_type").as("src_step"), col("dst_step"))
      .groupBy(col("d"), col("src_step"), col("dst_step"))
      .agg(count(lit(1)).as("n_trans"))
      .orderBy(col("d"), col("src_step"), col("dst_step"))
  }
}
