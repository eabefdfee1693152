package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered (temporal) conversion funnels: how many users performed
  * step 1, then step 2 AFTER it, then step 3 after that — the
  * sequence-sensitive complement of [[Sketches.funnelDaily]]'s
  * set-membership funnel (which counts a user who purchased BEFORE
  * ever clicking; this one doesn't).
  *
  * Plan shape: one shuffle to (grain, user), each user-grain's events
  * collected and sorted IN MEMORY (bounded by per-user-per-day event
  * volume — the same boundedness sessionization relies on), a single
  * codegen'd `aggregate` fold computes the depth, then one bounded
  * per-grain count aggregation. No self-joins: the exact relational
  * form is one min-timestamp join per funnel step (see the DuckDB
  * oracle twin), which at N steps is N shuffles over the full event
  * set; here the event set shuffles once regardless of N.
  *
  * Greedy earliest-match is optimal for unwindowed subsequence
  * matching, so the fold's depth equals the chained-min oracle's.
  * Same-timestamp events sort by step position (view before click at
  * an equal ts), matching the oracle's inclusive `ts >= prev_ts`
  * chaining.
  */
object Funnel {

  /** 0-based funnel position of the row's event_type, -1 if none. */
  private[graft] def stepIndex(steps: Seq[String]): Column =
    steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col("event_type") === s, lit(i)).otherwise(acc)
    }

  /** Greedy match fold over a sorted array<struct<t,si>>: a step event
    * is matched iff it is the one the prefix is waiting for; returns
    * the matched events' timestamps in step order (size = depth, the
    * first element is the chain's start, the last its completion so
    * far). Greedy earliest-match maximizes depth, and among
    * maximum-depth matchings takes each step's EARLIEST qualifying
    * event — exactly the chained-min relational form.
    */
  private def matchTimes(events: Column): Column =
    aggregate(events, lit(Array.empty[Long]),
      (acc, e) => when(e.getField("si") === size(acc),
        concat(acc, array(e.getField("t")))).otherwise(acc))

  /** (`d`, `user_id`, `t` µs, `si`) projection of the events table
    * restricted to funnel steps. Microsecond longs order identically
    * to the source timestamps (µs-resolution data) and subtract
    * directly for conversion lags.
    */
  private def dayFrame(spark: SparkSession, dir: String, steps: Seq[String]): DataFrame =
    dayFrameOf(graft.Tables.events(spark, dir), steps)

  private def dayFrameOf(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    events
      .filter(col("event_type").isin(steps: _*))
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"),
        col("user_id"), unix_micros(col("ts").cast("timestamp")).as("t"),
        stepIndex(steps).as("si"))
  }

  /** Per-day ordered funnel over the events table. Output: `d` plus
    * `n_step1..n_stepN` — users whose day contained steps 1..k in
    * temporal order. Exactly matches the chained min-timestamp
    * relational form (oracle-verified), in one event-set shuffle.
    */
  def orderedDaily(spark: SparkSession, dir: String,
                   steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    orderedCounts(graft.Tables.events(spark, dir), steps)
      // a day whose step events never include step 1 has no funnel
      // entrants; the chained-min relational form (and the oracle
      // built from it) emits no row for such days
      .filter(col("n_step1") > 0)
      .orderBy(col("d"))

  /** The UNFILTERED per-day depth counts (d, n_step1..n) — additive
    * over whole (day, user) event groups, so also the stored
    * lifecycle's batch unit. The step-1 row filter applies at READ
    * time (a later batch can still bring a day its first entrant).
    */
  def orderedCounts(events: DataFrame,
                    steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = dayFrameOf(events, steps)
    val depth = size(matchTimes(array_sort(collect_list(struct(col("t"), col("si"))))))
    val counts = steps.indices.map(i =>
      sum(when(col("depth") > i, 1L).otherwise(0L)).as(s"n_step${i + 1}"))
    ev.groupBy(col("d"), col("user_id"))
      .agg(depth.as("depth"))
      .groupBy(col("d"))
      .agg(counts.head, counts.tail: _*)
  }

  // ---- stored daily-funnel lifecycle ------------------------------------

  /** The ordered day-grain funnel in the exact additive [[CountTable]]
    * lifecycle (days × 1 rows): append batches must carry WHOLE
    * (day, user) event groups — the greedy fold is a window within
    * that grain (the daily-load unit; [[graft.streaming.StreamingFunnel]]
    * is the arbitrary-arrival path). `batchId` stamps replays away.
    */
  def writeDailyTable(spark: SparkSession, name: String, events: DataFrame,
                      steps: Seq[String] = Seq("view", "click", "purchase"),
                      buckets: Int = 16): Unit =
    CountTable.write(spark, name, orderedCounts(events, steps),
      Seq("d"), steps.indices.map(i => s"n_step${i + 1}"), buckets)

  def appendToDailyTable(spark: SparkSession, name: String, batch: DataFrame,
                         steps: Seq[String] = Seq("view", "click", "purchase"),
                         batchId: Long = -1L): Unit =
    CountTable.append(spark, name, orderedCounts(batch, steps), batchId)

  /** [[orderedDaily]] answered from the STORED counts alone. */
  def dailyFromTable(spark: SparkSession, name: String): DataFrame =
    CountTable.read(spark, name)
      .filter(col("n_step1") > 0)
      .orderBy(col("d"))

  /** Per-day conversion latency: how many users completed the WHOLE
    * chain in order, and the summed first-step → last-step lag (µs)
    * across them — same single event-set shuffle as [[orderedDaily]],
    * the matched-timestamp array carrying the chain's endpoints out
    * of the fold. Exact (oracle-verified): the greedy fold's matched
    * times ARE the chained step minima.
    */
  def lagDaily(spark: SparkSession, dir: String,
               steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = dayFrame(spark, dir, steps)
    val n = steps.length
    val times = matchTimes(array_sort(collect_list(struct(col("t"), col("si")))))
    ev.groupBy(col("d"), col("user_id"))
      .agg(times.as("mt"))
      .groupBy(col("d"))
      .agg(sum(when(size(col("mt")) === n, 1L).otherwise(0L)).as("n_conv"),
        coalesce(sum(when(size(col("mt")) === n,
          element_at(col("mt"), n) - element_at(col("mt"), 1))), lit(0L)).as("sum_lag_us"),
        sum(when(size(col("mt")) >= 1, 1L).otherwise(0L)).as("_n1"))
      // match [[orderedDaily]]'s row set: a day with step events but
      // no step-1 entrant emits nothing (the oracle's FROM clause)
      .filter(col("_n1") > 0).drop("_n1")
      .orderBy(col("d"))
  }

  /** SESSION-grain ordered funnel: the chain must complete in order
    * within one gap-session — the grain product analytics defaults to
    * (a user who viewed this morning and purchased tonight converts
    * at day grain but not here). Sessions come from
    * [[Sessionize.withSessionIds]] over ALL events (an unrelated
    * event type keeps a session alive, exactly like the q12
    * operator), then the same greedy fold runs per (user, session)
    * and sessions roll up to the day their FIRST event fell on.
    * Counts are SESSIONS at each depth — one user converting in two
    * sessions that day counts twice, which is the session-grain
    * question. Plan: the sessionize window shuffle on user, one
    * (user, session) window for the session start, then the fold's
    * aggregation — the event set shuffles twice total (once keyed
    * user, once keyed (user, session)), never per step. Same
    * second-truncated timestamps as q12 (engine-precision-
    * independent); same-second events fold in step order, matching
    * the oracle's inclusive chained-min. Days whose sessions have no
    * step-1 entrant emit nothing (the [[orderedDaily]] convention).
    */
  def sessionDaily(spark: SparkSession, dir: String,
                   gapSeconds: Long = 1800L,
                   steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    sessionDaily(graft.Tables.events(spark, dir), gapSeconds, steps)

  /** The same computation over any frame with `user_id`, `event_id`,
    * `ts`, `event_type` — the composition/rehearsal form.
    */
  def sessionDaily(events: DataFrame, gapSeconds: Long, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val se = Sessionize.withSessionIds(events, gapSeconds)
    val byUS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("session_id"))
    val f = se
      .withColumn("start_s", min(col("ts_s")).over(byUS))
      .filter(col("event_type").isin(steps: _*))
      .select(expr("(start_s div 86400) * 86400").as("d"),
        col("user_id"), col("session_id"),
        col("ts_s").as("t"), stepIndex(steps).as("si"))
    val depth = size(matchTimes(array_sort(collect_list(struct(col("t"), col("si"))))))
    val counts = steps.indices.map(i =>
      sum(when(col("depth") > i, 1L).otherwise(0L)).as(s"n_step${i + 1}"))
    f.groupBy(col("d"), col("user_id"), col("session_id"))
      .agg(depth.as("depth"))
      .groupBy(col("d"))
      .agg(counts.head, counts.tail: _*)
      .filter(col("n_step1") > 0)
      .orderBy(col("d"))
  }

  /** SESSION-grain conversion latency: sessions completing the WHOLE
    * ordered chain within one gap-session, and their summed
    * first-step → last-step lag in SECONDS (the session tier's q12
    * truncation — [[lagDaily]]'s day-grain twin reports µs off the
    * raw timestamps). Sessions from [[Sessionize.withSessionIds]]
    * over ALL events, the greedy fold per (user, session), sessions
    * on their FIRST event's day, days with no step-1 entrant emit
    * nothing — the [[sessionDaily]] conventions exactly, with the
    * matched-times array carrying the chain endpoints out of the same
    * single fold. Output: `d`, `n_conv`, `sum_lag_s`.
    */
  def lagSessionDaily(spark: SparkSession, dir: String,
                      gapSeconds: Long = 1800L,
                      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    lagSessionDaily(graft.Tables.events(spark, dir), gapSeconds, steps)

  def lagSessionDaily(events: DataFrame, gapSeconds: Long,
                      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.length
    val se = Sessionize.withSessionIds(events, gapSeconds)
    val byUS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("session_id"))
    val f = se
      .withColumn("start_s", min(col("ts_s")).over(byUS))
      .filter(col("event_type").isin(steps: _*))
      .select(expr("(start_s div 86400) * 86400").as("d"),
        col("user_id"), col("session_id"),
        col("ts_s").as("t"), stepIndex(steps).as("si"))
    val times = matchTimes(array_sort(collect_list(struct(col("t"), col("si")))))
    f.groupBy(col("d"), col("user_id"), col("session_id"))
      .agg(times.as("mt"))
      .groupBy(col("d"))
      .agg(sum(when(size(col("mt")) === n, 1L).otherwise(0L)).as("n_conv"),
        coalesce(sum(when(size(col("mt")) === n,
          element_at(col("mt"), n) - element_at(col("mt"), 1))), lit(0L)).as("sum_lag_s"),
        sum(when(size(col("mt")) >= 1, 1L).otherwise(0L)).as("_n1"))
      .filter(col("_n1") > 0).drop("_n1")
      .orderBy(col("d"))
  }

  /** Matched first-step → last-step conversion lags (µs) of fully
    * converted (day, user) chains — the raw-value feed behind
    * [[lagQuantilesDaily]] and the stored per-day lag-summary
    * lifecycle (`Sketches.writeQuantileTable(name, matchedLags(…),
    * Seq("d"), "lag_us")`): persist one GK summary per day and any
    * day-range lag percentile answers from the bounded sketch table
    * (`Sketches.rollupQuantileTable`) with the ε rank bound
    * surviving the merge — raw history is never rescanned. Output:
    * `d`, `lag_us` (one row per converted user).
    */
  def matchedLags(spark: SparkSession, dir: String,
                  steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = dayFrame(spark, dir, steps)
    val n = steps.length
    val times = matchTimes(array_sort(collect_list(struct(col("t"), col("si")))))
    ev.groupBy(col("d"), col("user_id"))
      .agg(times.as("mt"))
      .filter(size(col("mt")) === n)
      .select(col("d"),
        (element_at(col("mt"), n) - element_at(col("mt"), 1)).as("lag_us"))
  }

  /** Per-day conversion-latency percentiles: the question analysts
    * actually ask of [[lagDaily]]'s sums ("p50/p90 time-to-convert"),
    * answered by feeding the matched lags into the GK quantile-sketch
    * tier — same single event-set shuffle to (day, user), then ONE
    * summary per day (constant-size partials ride the per-day
    * aggregation; the shuffle carries sketches, not lag lists).
    * Below 1/(2ε) conversions/day the summary is RANK-EXACT (the
    * error budget is under one rank), so each queried value is the
    * element at exactly rank ⌈q·n⌉ — the oracle-exactness regime the
    * sketch_quantiles/q16 precedent documents; beyond it the ε rank
    * bound travels via `Sketches.quantilesGate`'s machinery. Output:
    * `d`, `n_conv`, one `p<q>` double column per quantile.
    */
  def lagQuantilesDaily(spark: SparkSession, dir: String,
                        steps: Seq[String] = Seq("view", "click", "purchase"),
                        quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val lags = matchedLags(spark, dir, steps)
    lags.groupBy(col("d"))
      .agg(count(lit(1)).as("n_conv"),
        Sketches.quantileSketch(col("lag_us").cast("double")).as("sk"))
      .select(col("d"), col("n_conv"),
        Sketches.quantileQuery(col("sk"), quantiles).as("qs"))
      .select(Seq(col("d"), col("n_conv")) ++ quantiles.zipWithIndex.map {
        case (q, i) => element_at(col("qs"), i + 1).as(Sketches.quantileColName(q))
      }: _*)
      .orderBy(col("d"))
  }

  /** Windowed ordered funnel depth per group: the deepest prefix of
    * `steps` completed in order with EVERY step inside `windowSec`
    * seconds of the chain's FIRST step (the windowFunnel semantics of
    * the streaming-analytics engines). A later step-1 event re-anchors
    * tracking when the earlier anchor's window has run out — per
    * level the fold keeps the LATEST viable anchor, which dominates
    * (more remaining headroom) and makes the greedy fold exact.
    *
    * Input frame needs `user_id`, `ts` (timestamp), `event_type`;
    * `groupCols` is the extra grain (e.g. a day column) beyond the
    * user. Output: groupCols ++ user_id ++ `depth`.
    */
  def windowDepth(events: DataFrame, steps: Seq[String], windowSec: Long,
                  groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.length
    val ev = events
      .filter(col("event_type").isin(steps: _*))
      .select(groupCols.map(col) ++ Seq(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"), stepIndex(steps).as("si")): _*)
    val winMicros = lit(windowSec * 1000000L)
    // anchors[lvl] = latest chain-start time (µs) among chains that
    // have reached level lvl within the window; -1 = none. Levels fill
    // contiguously (level k needs level k-1), so depth = #set anchors.
    val anchors = aggregate(
      array_sort(collect_list(struct(col("t"), col("si")))),
      array(Seq.fill(n)(lit(-1L)): _*),
      (acc, e) => transform(sequence(lit(0), lit(n - 1)), lvl => {
        val cur = element_at(acc, lvl + 1)
        val prev = element_at(acc, lvl) // undefined at lvl 0, guarded below
        when(lvl === e.getField("si"),
          if (n == 1) greatest(cur, e.getField("t"))
          else when(lvl === 0, greatest(cur, e.getField("t")))
            .otherwise(when(prev >= 0 && e.getField("t") - prev <= winMicros,
              greatest(cur, prev)).otherwise(cur)))
          .otherwise(cur)
      }))
    ev.groupBy((groupCols :+ "user_id").map(col): _*)
      .agg(size(filter(anchors, a => a >= 0)).as("depth"))
  }

  /** [[windowDepth]]'s fold as a single aggregate Column
    * (`graft.functions.expressions.WindowFunnelAgg` — also
    * SQL-registered as `graft_window_funnel` by GraftExtensions):
    * `t` and `si` as in the fold, `windowSpan` in `t`'s unit. The
    * buffer collects the group's step events and the FINAL eval
    * sorts + folds (the greedy fold is order-sensitive, so no eager
    * partial folding), same boundedness as the collect_list form.
    */
  def depthAgg(t: Column, si: Column, windowSpan: Long, nSteps: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.expressions.WindowFunnelAgg(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(t),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(si),
        windowSpan, nSteps).toAggregateExpression())

  /** Per-day windowed funnel counts over the events table: users per
    * day at each depth, with the whole chain inside `windowSec` of its
    * first step. `windowSec` ≥ 86400 degenerates to [[orderedDaily]].
    */
  def windowDaily(spark: SparkSession, dir: String, windowSec: Long,
                  steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    val counts = steps.indices.map(i =>
      sum(when(col("depth") > i, 1L).otherwise(0L)).as(s"n_step${i + 1}"))
    windowDepth(ev, steps, windowSec, Seq("d"))
      .groupBy(col("d"))
      .agg(counts.head, counts.tail: _*)
      // [[orderedDaily]]'s row-set convention: no step-1 entrant, no row
      .filter(col("n_step1") > 0)
      .orderBy(col("d"))
  }
}
