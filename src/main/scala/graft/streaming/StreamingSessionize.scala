package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the streaming twin of
  * [[graft.operators.Sessionize]] (q12's batch operator): a user's
  * session closes when `gapSeconds` pass with no further event.
  *
  * Mechanics (`flatMapGroupsWithState` keyed on user,
  * EventTimeTimeout — the same state template as
  * [[StreamingDedup.firstSeen]]):
  *  - events inside one batch fold in event-time order; a gap WITHIN
  *    the batch closes the earlier session immediately (emitted this
  *    micro-batch);
  *  - the open session parks in state with a timeout at
  *    last_event + gap: when the WATERMARK passes that instant no
  *    in-order event can extend the session anymore, the timeout
  *    fires, and the session emits exactly once. State per user is
  *    one (start, last, n, sum) row, watermark-bounded — unbounded
  *    streams run at bounded memory.
  *  - an out-of-order event (allowed inside the watermark horizon)
  *    that lands at-or-before the open session's last event extends
  *    that session in place (start = min, counts fold in) — the
  *    standard merge approximation; events later than the watermark
  *    are dropped upstream by the watermark itself, identical to
  *    every watermarked operator here.
  *
  * Scale shape: one shuffle on user_id — the exact invariant of the
  * batch twin (whose lag + cumulative-flag plan also shuffles once);
  * session assembly is within-partition state, no second exchange.
  */
object StreamingSessionize {

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  // not private: Catalyst's generated encoder projections need access
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessState(startMs: Long, lastMs: Long, n: Long, sum: Double)

  def sessions(events: DataFrame, tsCol: String, watermarkDelay: String,
               gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    val evs = events
      .select(col("user_id").cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]

    def emit(uid: Long, st: SessState): SessionOut =
      SessionOut(uid, new java.sql.Timestamp(st.startMs), new java.sql.Timestamp(st.lastMs),
        st.n, st.sum)

    def update(uid: Long, rows: Iterator[Ev],
               state: GroupState[SessState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // the watermark passed last_event + gap: nothing in-order can
        // extend this session — close it exactly once
        val out = state.getOption.map(emit(uid, _))
        state.remove()
        out.iterator
      } else {
        val batch = rows.toSeq.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Seq.newBuilder[SessionOut]
        batch.foreach { e =>
          val t = e.ts.getTime
          open = open match {
            case None => Some(SessState(t, t, 1L, e.value))
            case Some(s) if t > s.lastMs + gapMs =>
              closed += emit(uid, s) // intra-batch gap: close now
              Some(SessState(t, t, 1L, e.value))
            case Some(s) =>
              // extends (in order), or out-of-order merge (t ≤ last)
              Some(SessState(math.min(s.startMs, t), math.max(s.lastMs, t),
                s.n + 1L, s.sum + e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          // fire when the watermark passes last + gap (must stay
          // strictly ahead of the current watermark or the state
          // store rejects the timestamp)
          state.setTimeoutTimestamp(
            math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
        }
        closed.result().iterator
      }
    }

    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
