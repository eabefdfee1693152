package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming session analytics — the streaming twin of the SESSION
  * tier ([[graft.operators.Funnel.sessionDaily]],
  * [[graft.operators.PathAnalysis.topkSession]] /
  * [[graft.operators.PathAnalysis.transitionsSession]]): each closed
  * gap-session emits ONE row carrying everything those batch
  * operators derive from it — the start day, the truncated path, the
  * greedy funnel depth, and the adjacent-pair edge list — so the
  * per-day rollups (depth counts, path histograms, transition
  * matrices) are bounded downstream aggregations exactly as in the
  * batch plans.
  *
  * Session mechanics are [[StreamingSessionize]]'s verbatim (gap
  * close within a batch, watermark-timeout close across batches,
  * exactly-once emission, out-of-order events inside the horizon fold
  * into the open session), except the state buffers the open
  * session's (second, event_id, type) rows instead of four scalars —
  * bounded by session length, the same per-session boundedness the
  * batch tier's collect_list relies on. Timestamps truncate to whole
  * SECONDS (the batch tier's q12 convention), so gap decisions, path
  * order (ts_s, event_id — total), the funnel's (t, step) fold order
  * and the start day all match the batch twins bit-for-bit on an
  * in-order replay (spec-pinned against all three batch operators).
  *
  * Scale shape: ONE shuffle on user_id; everything else is
  * within-partition state plus the bounded rollups downstream.
  */
object StreamingSessionPaths {

  case class Edge(src_step: String, dst_step: String)
  case class SessionPathOut(user_id: Long, d: Long, n_events: Long,
                            path: String, depth: Int, edges: Seq[Edge])
  // not private: Catalyst's generated encoder projections need access
  case class SEv(user_id: Long, t_sec: Long, eventId: Long, tpe: String,
                 ts: java.sql.Timestamp)
  case class SPState(events: Seq[(Long, Long, String)])

  def sessions(events: DataFrame, tsCol: String, watermarkDelay: String,
               gapSeconds: Long = 1800L,
               steps: Seq[String] = Seq("view", "click", "purchase"),
               maxSteps: Int = 5): Dataset[SessionPathOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepIdx = steps.zipWithIndex.toMap
    val evs = events
      .withColumn("ts", col(tsCol).cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("t_sec"),
        col("event_id").cast("long").as("eventId"),
        col("event_type").as("tpe"),
        col("ts"))
      .as[SEv]

    def emit(uid: Long, buf: Seq[(Long, Long, String)]): SessionPathOut = {
      val sorted = buf.sortBy(e => (e._1, e._2))
      val d = (sorted.head._1 / 86400L) * 86400L
      val path = sorted.take(maxSteps).map(_._3).mkString(">")
      // the batch fold: step events in (t, si) order, a step matches
      // iff it is the one the prefix awaits (same-second events fold
      // in step order — the struct sort's tie rule)
      var depth = 0
      sorted.flatMap(e => stepIdx.get(e._3).map(si => (e._1, si)))
        .sorted
        .foreach { case (_, si) => if (si == depth) depth += 1 }
      val edges = if (sorted.length < 2) Seq.empty[Edge]
                  else sorted.zip(sorted.tail).map { case (a, b) => Edge(a._3, b._3) }
      SessionPathOut(uid, d, sorted.length, path, depth, edges)
    }

    def update(uid: Long, rows: Iterator[SEv],
               state: GroupState[SPState]): Iterator[SessionPathOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(s => emit(uid, s.events))
        state.remove()
        out.iterator
      } else {
        val batch = rows.toSeq.sortBy(e => (e.t_sec, e.eventId))
        var open = state.getOption.map(_.events).getOrElse(Seq.empty)
        var lastS = open.map(_._1).maxOption.getOrElse(Long.MinValue)
        val closed = Seq.newBuilder[SessionPathOut]
        batch.foreach { e =>
          if (open.nonEmpty && e.t_sec > lastS + gapSeconds) {
            closed += emit(uid, open) // intra-batch gap: close now
            open = Seq.empty
          }
          open = open :+ ((e.t_sec, e.eventId, e.tpe))
          lastS = if (open.lengthCompare(1) == 0) e.t_sec else math.max(lastS, e.t_sec)
        }
        if (open.isEmpty) state.remove()
        else {
          state.update(SPState(open))
          // close when the watermark passes last + gap (kept strictly
          // past the current watermark or the store rejects it)
          state.setTimeoutTimestamp(
            math.max((lastS + gapSeconds) * 1000L, state.getCurrentWatermarkMs() + 1L))
        }
        closed.result().iterator
      }
    }

    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
